"""Fused Pallas kernel (ops/fused.py) vs the reference XLA forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hifimeth_tpu.engine.call import default_model_dir
from hifimeth_tpu.features.windows import (featurize_planes_t,
                                           gather_windows_slice)
from hifimeth_tpu.model.cnn import (conv_spec, dnamodnet_apply,
                                    load_params_npz,
                                    logits_to_scaled_probs)
from hifimeth_tpu.ops.fused import (GROUP, KMER, call_sites_fused,
                                    fused_forward, prepare_fused_params,
                                    reverse_table)
import os


def _setup(seed=3, n_groups=4, cap=1 << 15):
    rng = np.random.default_rng(seed)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    lo, hi = KMER + 16, cap - KMER - 16
    planes[0, lo:hi] = rng.integers(0, 4, hi - lo)
    planes[1:, lo:hi] = rng.integers(0, 256, (4, hi - lo))
    feats_t = featurize_planes_t(jnp.asarray(planes))

    # group-local clusters (real candidate sites are ~2.5 bp apart; each
    # group of 32 windows must fit one 2048-lane block)
    span = 1200
    anchors = np.linspace(lo + 8, hi - 8 - span, n_groups).astype(np.int64)
    centers = np.concatenate([
        np.sort(a + rng.choice(span, GROUP, replace=False))
        for a in anchors]).astype(np.int32)
    n = n_groups * GROUP
    starts = centers - KMER // 2
    # one block per group for the test: base = 128-aligned floor of the
    # group's first start (test sites are dense enough to fit one block)
    bases, rels = _plan(starts, cap)
    return rng, planes, feats_t, centers, bases, rels


def _plan(starts, cap):
    """One block per group (test-only): 128-aligned base clipped to keep
    the 2048-lane block in-bounds, exactly as ops/gather.plan_groups."""
    n_groups = len(starts) // GROUP
    bases, rels = [], []
    for gi in range(n_groups):
        s = starts[gi * GROUP:(gi + 1) * GROUP]
        b = min((int(s.min()) // 128) * 128, cap - 2048)
        rel = s - b
        assert rel.max() <= 2048 - 640 + 127, "test sites too spread"
        bases.append(b)
        rels.append(rel)
    return np.asarray(bases, np.int32), np.asarray(rels, np.int32)


@pytest.fixture(scope="module")
def model():
    params = load_params_npz(os.path.join(default_model_dir(), "CpG.npz"))
    return params, conv_spec(params), prepare_fused_params(params)


def _expected_logits(params, spec, feats, centers, strands=None):
    n = len(centers)
    strands = np.zeros(n, np.uint8) if strands is None else strands
    rstart = np.zeros(n, np.int32)
    rend = np.full(n, feats.shape[1], np.int32)
    w = gather_windows_slice(feats.T, jnp.asarray(centers),
                             jnp.asarray(strands), jnp.asarray(rstart),
                             jnp.asarray(rend), KMER)
    return np.asarray(dnamodnet_apply(params, w, spec=spec))


def test_fused_forward_matches_reference(model):
    params, spec, prep = model
    _, _, feats_t, centers, bases, rels = _setup()
    want = _expected_logits(params, spec, feats_t, centers)
    rows = np.asarray(fused_forward(prep, feats_t, jnp.asarray(bases),
                                    jnp.asarray(rels), interpret=True))
    got = rows[:, :2]
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)
    # u8 scaled probs: at most 1 bucket off at f32 reassociation boundaries
    pw = np.asarray(logits_to_scaled_probs(jnp.asarray(want)))
    pg = np.asarray(logits_to_scaled_probs(jnp.asarray(got)))
    d = np.abs(pw.astype(int) - pg.astype(int))
    assert d.max() <= 1, d.max()


def test_fused_reverse_strand(model):
    """Reverse-strand sites run the SAME kernel against the pre-reversed
    table at mirrored starts; compare against gather_windows_slice with
    strand=1 (flip + channel permutation)."""
    params, spec, prep = model
    _, _, feats_t, centers, _, _ = _setup(seed=9)
    N = feats_t.shape[1]
    want = _expected_logits(params, spec, feats_t, centers,
                            strands=np.ones(len(centers), np.uint8))

    feats_rev = reverse_table(feats_t)
    # mirrored window start: rev coord of (center + hk)
    hk = KMER // 2
    starts_rev = (N - 1 - (centers.astype(np.int64) + hk)).astype(np.int32)
    order = np.argsort(starts_rev, kind="stable")
    sr = starts_rev[order]
    bases, rels = _plan(sr, N)
    rows = np.asarray(fused_forward(prep, feats_rev, jnp.asarray(bases),
                                    jnp.asarray(rels), interpret=True))
    got = np.empty_like(rows[:, :2])
    got[order] = rows[:, :2]
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_call_sites_fused_probs(model):
    params, spec, prep = model
    _, _, feats_t, centers, bases, rels = _setup(seed=11)
    want = logits_to_scaled_probs(jnp.asarray(
        _expected_logits(params, spec, feats_t, centers)))
    got = np.asarray(call_sites_fused(
        prep, feats_t, jnp.asarray(bases[None, :]),
        jnp.asarray(rels[None, :, :]), interpret=True))
    d = np.abs(np.asarray(want).astype(int) - got.astype(int))
    assert d.max() <= 1


def test_fused_engine_e2e(tmp_path):
    """gather_impl=fused through the full CallEngine (all contexts, incl.
    reverse-strand CHH via the mirrored table): identical MM strings and
    ML probs within 1 u8 bucket of the slice path."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from util import make_kinetics_read, write_bam

    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader

    rng = np.random.default_rng(17)
    recs = [make_kinetics_read(rng, f"r{i}", 1500) for i in range(3)]
    bam = tmp_path / "in.bam"
    write_bam(bam, recs)

    outs = {}
    for impl in ("slice", "fused"):
        out = tmp_path / f"{impl}.bam"
        run_call(str(bam), str(out),
                 CallConfig(site_batch=256, gather_impl=impl), cmdline="t")
        mm, ml = [], []
        for r in BamReader(str(out)):
            mm.append(r.get_tag("MM")[1])
            ml.append(np.asarray(r.get_tag("ML")[1][1], int))
        outs[impl] = (mm, np.concatenate(ml))
    assert outs["slice"][0] == outs["fused"][0], "MM strings differ"
    d = np.abs(outs["slice"][1] - outs["fused"][1])
    assert d.max() <= 1, f"ML drift {d.max()}"
