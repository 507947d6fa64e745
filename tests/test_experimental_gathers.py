"""Retired experimental paths (scripts/experimental_gathers.py) keep
their parity tests: call_sites_dense (densified first conv) must reproduce the
windowed pipeline, including read edges, both strands, and both shipped
kernel sizes (11 and 13)."""
import numpy as np
import pytest

import jax.numpy as jnp

from hifimeth_tpu.engine.call import ModelSet, default_model_dir
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from experimental_gathers import (call_sites_dense,  # noqa: E402
                                  gather_windows_slice_u8)
from hifimeth_tpu.features.windows import (call_sites_batched,  # noqa: E402
                                           featurize_planes,
                                           gather_windows_slice)


def _make_buffer(rng, cap, margin, gap, read_lens):
    """Pack reads like the engine does: margin, then reads separated by
    gap zeros with seq-plane 255 in the unfilled regions."""
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    bounds = []
    fill = margin
    for L in read_lens:
        planes[0, fill:fill + L] = rng.integers(0, 4, L)
        # occasionally an N (code 14) inside the read
        if L > 50:
            planes[0, fill + 10] = 14
        planes[1:, fill:fill + L] = rng.integers(0, 256, (4, L))
        bounds.append((fill, fill + L))
        fill += L + gap
    return planes, bounds


@pytest.mark.parametrize("ctx", ["CpG", "CHH"])   # K=11 and K=13
def test_dense_matches_windowed(ctx):
    models = ModelSet(default_model_dir(), contexts=(ctx,))
    kmer = models.kmer
    rng = np.random.default_rng(0)
    cap = 8192
    margin = kmer
    planes, bounds = _make_buffer(rng, cap, margin, 16,
                                  [900, 120, 2000, 401, 55])

    centers, strands, rstart, rend = [], [], [], []
    for (rs, re) in bounds:
        L = re - rs
        # sites everywhere including extreme edges
        offs = sorted(set(
            [0, 1, 2, L - 1, L - 2, L // 2] +
            list(rng.integers(0, L, 12))))
        for o in offs:
            for st in (0, 1):
                centers.append(rs + o)
                strands.append(st)
                rstart.append(rs)
                rend.append(re)
    n = len(centers)
    bs = 64
    pad = (-n) % bs
    centers += [0] * pad
    strands += [0] * pad
    rstart += [0] * pad
    rend += [0] * pad

    args = (jnp.asarray(np.array(centers, np.int32)),
            jnp.asarray(np.array(strands, np.uint8)),
            jnp.asarray(np.array(rstart, np.int32)),
            jnp.asarray(np.array(rend, np.int32)))
    feats = featurize_planes(jnp.asarray(planes))
    kw = dict(site_batch=bs, kmer_size=kmer, spec=models.specs[ctx])
    want = np.asarray(call_sites_batched(models.params[ctx], feats, *args, **kw))[:n]
    got = np.asarray(call_sites_dense(models.params[ctx], feats, *args, **kw))[:n]
    diff = np.abs(got.astype(int) - want.astype(int))
    # float reassociation in the dense conv can flip a u8 bucket on knife-edge
    # values; anything beyond +/-1 would indicate a real semantic mismatch
    assert diff.max() <= 1, (
        f"{ctx}: dense path deviates: max {diff.max()}, "
        f"n>{1}: {(diff > 1).sum()}/{n}")
    assert (diff > 0).mean() < 0.05


def test_u8_slice_gather_matches_f32_slice():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    cap = 4096
    margin = 401
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    planes[0, margin:cap - margin] = rng.integers(0, 4, cap - 2 * margin)
    planes[1:, margin:cap - margin] = rng.integers(0, 256, (4, cap - 2 * margin))
    B = 64
    centers = rng.integers(margin, cap - margin, B).astype(np.int32)
    strands = rng.integers(0, 2, B).astype(np.uint8)
    rstart = np.full(B, margin, np.int32)
    rend = np.full(B, cap - margin, np.int32)
    rstart[::3] = centers[::3] - 20
    rend[::5] = centers[::5] + 9

    feats = featurize_planes(jnp.asarray(planes))
    a = np.asarray(gather_windows_slice(feats, jnp.asarray(centers),
                                        jnp.asarray(strands),
                                        jnp.asarray(rstart),
                                        jnp.asarray(rend)))
    pt = jnp.asarray(np.ascontiguousarray(planes.T))
    b = np.asarray(gather_windows_slice_u8(pt, jnp.asarray(centers),
                                           jnp.asarray(strands),
                                           jnp.asarray(rstart),
                                           jnp.asarray(rend)))
    np.testing.assert_array_equal(a, b)
