#!/usr/bin/env python3
"""Fused-kernel device microbench: call_sites_fused vs call_sites_pallas.

Times the production chunk shapes (site_batch 8192 = 256 groups per chunk)
with the nb=1 vs nb=8 differencing protocol and interleaved repetitions.
Also checks on-device numerics vs the XLA path first (small batch).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hifimeth_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--site-batch", type=int, default=8192)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    from hifimeth_tpu.engine.call import CallConfig, CallEngine
    from hifimeth_tpu.features.windows import (call_sites_pallas,
                                               featurize_planes_t_seg)
    from hifimeth_tpu.model.cnn import logits_to_scaled_probs
    from hifimeth_tpu.ops.fused import (GROUP, call_sites_fused,
                                        fused_forward, prepare_fused_params)
    from hifimeth_tpu.ops.gather import CHUNK_LANES, plan_groups

    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}",
          file=sys.stderr)
    eng = CallEngine(CallConfig(site_batch=args.site_batch))
    cap = eng.cfg.buffer_bases
    kmer = eng.models.kmer
    G, BL = eng.GROUP, eng.BLOCK_LANES
    ngrp = args.site_batch // G
    rng = np.random.default_rng(3)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    lo, hi = kmer, cap - kmer
    planes[0, lo:hi] = rng.integers(0, 4, hi - lo)
    planes[1:, lo:hi] = rng.integers(0, 256, (4, hi - lo))
    seg = cap // eng.H2D_SEGMENTS
    segments = tuple(jnp.asarray(np.ascontiguousarray(planes[:, a:a + seg]))
                     for a in range(0, cap, seg))
    feats_t = featurize_planes_t_seg(segments, cap=cap)
    np.asarray(jax.jit(jnp.sum)(feats_t))
    from hifimeth_tpu.model.cnn import load_params_npz
    prep = prepare_fused_params(load_params_npz(
        os.path.join(eng.cfg.resolve_model_dir(), "CpG.npz")))

    def make_chunk(nb):
        n = nb * args.site_batch
        span = min(int(n * 3.3), hi - lo)
        centers = np.sort(lo + rng.integers(0, span, n)).astype(np.int32)
        hk = kmer // 2
        bases, rels, _ = plan_groups((centers - hk).astype(np.int32), G, BL,
                                     kmer, cap, extent=CHUNK_LANES + 127)
        b128 = (bases // 128) * 128
        rels = rels + (bases - b128)[:, None]
        pad_g = nb * ngrp - len(bases)
        if pad_g > 0:
            b128 = np.concatenate([b128, np.zeros(pad_g, np.int32)])
            rels = np.concatenate([rels, np.zeros((pad_g, G), np.int32)])
        return (jnp.asarray(b128[:nb * ngrp].reshape(nb, ngrp)),
                jnp.asarray(rels[:nb * ngrp].reshape(nb, ngrp, G)))

    kw = dict(kmer_size=kmer, compute_dtype=eng.compute_dtype,
              spec=eng.models.specs["CpG"], conv_impl="direct",
              group=G, block_lanes=BL,
              interpret=jax.default_backend() == "cpu")
    params = eng.models.params["CpG"]
    interp = jax.default_backend() == "cpu"

    if not args.skip_check:
        # small on-device numerics check first (also smokes the compile)
        b1, r1 = make_chunk(1)
        t0 = time.time()
        probs_f = np.asarray(call_sites_fused(prep, feats_t, b1, r1,
                                              interpret=interp))
        print(f"fused compile+run: {time.time() - t0:.1f} s", file=sys.stderr)
        probs_x = np.asarray(call_sites_pallas(params, feats_t, b1, r1,
                                               False, **kw))
        d = np.abs(probs_f.astype(int) - probs_x.astype(int))
        print(f"fused vs pallas+XLA probs: max {d.max()} "
              f"mean {d.mean():.4f} frac>1 {(d > 1).mean():.5f}",
              file=sys.stderr)

    chunks = {nb: make_chunk(nb) for nb in (1, 8)}
    times = {"fused": {1: float("inf"), 8: float("inf")},
             "pallas": {1: float("inf"), 8: float("inf")}}
    for nb in (1, 8):       # warm both impls/sizes
        b, r = chunks[nb]
        np.asarray(call_sites_fused(prep, feats_t, b, r, interpret=interp))
        np.asarray(call_sites_pallas(params, feats_t, b, r, False, **kw))
    for _ in range(6):
        for nb in (1, 8):
            b, r = chunks[nb]
            t0 = time.perf_counter()
            np.asarray(call_sites_fused(prep, feats_t, b, r,
                                        interpret=interp))
            times["fused"][nb] = min(times["fused"][nb],
                                     time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(call_sites_pallas(params, feats_t, b, r, False, **kw))
            times["pallas"][nb] = min(times["pallas"][nb],
                                      time.perf_counter() - t0)
    for name, t in times.items():
        per = (t[8] - t[1]) / 7
        print(f"{name}: nb1 {t[1]*1e3:.1f} ms, nb8 {t[8]*1e3:.1f} ms -> "
              f"{per*1e3:.2f} ms/batch = "
              f"{args.site_batch / per / 1e6:.2f} M sites/s", file=sys.stderr)


if __name__ == "__main__":
    main()
