import numpy as np

import jax
import jax.numpy as jnp

from hifimeth_tpu.parallel.collectives import (psum_histograms,
                                               psum_i64_multihost,
                                               psum_site_partials_multihost)
from hifimeth_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


def test_psum_histograms():
    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    local = rng.integers(0, 100, (8, 3, 256)).astype(np.int64)
    got = psum_histograms(mesh, local)
    np.testing.assert_array_equal(got, local.sum(0))


def test_site_partials_collectives_single_process():
    """Single-process identity of the pass-2 production collectives (the
    2-process path is covered end-to-end by test_multiprocess_dist.py's
    byte-equality test)."""
    rng = np.random.default_rng(1)
    p = rng.integers(0, 50, 4096).astype(np.int32)
    c = rng.integers(0, 50, 4096).astype(np.int32)
    m = rng.integers(0, 4, 4096).astype(np.int32)
    gp, gc, gm = psum_site_partials_multihost(p, c, m)
    np.testing.assert_array_equal(gp, p)
    np.testing.assert_array_equal(gc, c)
    np.testing.assert_array_equal(gm, m)
    flags = np.array([0, 3, 1, 0], np.int64)
    np.testing.assert_array_equal(psum_i64_multihost(flags), flags)


def test_sharded_call_sites_matches_single_device():
    """pjit'd call over the data axis == single-device result."""
    from hifimeth_tpu.engine.call import ModelSet, default_model_dir
    from hifimeth_tpu.features.windows import call_sites, featurize_planes

    models = ModelSet(default_model_dir(), contexts=("CpG",))
    rng = np.random.default_rng(2)
    cap = 4096
    planes = rng.integers(0, 255, (5, cap)).astype(np.uint8)
    planes[0] = rng.integers(0, 4, cap)
    B = 64
    centers = rng.integers(0, cap, B).astype(np.int32)
    strands = rng.integers(0, 2, B).astype(np.uint8)
    rstart = np.zeros(B, np.int32)
    rend = np.full(B, cap, np.int32)

    feats = featurize_planes(jnp.asarray(planes))
    kw = dict(kmer_size=models.kmer, spec=models.specs["CpG"])
    single = np.asarray(call_sites(
        models.params["CpG"], feats,
        jnp.asarray(centers), jnp.asarray(strands),
        jnp.asarray(rstart), jnp.asarray(rend), **kw))

    mesh = make_mesh(n_data=8, n_model=1)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    feats_r = jax.device_put(feats, rep)
    params_r = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                      models.params["CpG"])
    args = [jax.device_put(jnp.asarray(a), bs)
            for a in (centers, strands, rstart, rend)]
    sharded = np.asarray(call_sites(params_r, feats_r, *args, **kw))
    np.testing.assert_array_equal(single, sharded)
