#!/usr/bin/env python3
"""Microbenchmark of the production pallas call path on the live backend.

Times the EXACT programs the bench dispatches (same shapes/statics, so the
persistent compile cache is reused, no new compiles): featurize_planes_t on
the 4 Mi buffer, then call_sites_pallas chunks at the bucket sizes the
200-read bench uses.  Reports ms/batch and the per-dispatch fixed cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hifimeth_tpu.engine.call import (CallConfig, CallEngine,
                                          enable_compilation_cache)
    from hifimeth_tpu.features.windows import (call_sites_pallas,
                                               featurize_planes_t)
    from hifimeth_tpu.ops.gather import CHUNK_LANES, plan_groups

    enable_compilation_cache()
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    eng = CallEngine(CallConfig(site_batch=16384,
                                compute_dtype=("bfloat16" if dtype == jnp.bfloat16
                                               else "float32")))
    cap = eng.cfg.buffer_bases
    kmer = eng.models.kmer
    G, BL = eng.GROUP, eng.BLOCK_LANES
    ngrp = 16384 // G

    rng = np.random.default_rng(0)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    lo, hi = kmer, cap - kmer
    planes[0, lo:hi] = rng.integers(0, 4, hi - lo)
    planes[1:, lo:hi] = rng.integers(0, 256, (4, hi - lo))

    def timeit(label, fn, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best * 1e3:9.1f} ms")
        return best

    # raw tunnel round-trip (dispatch+D2H of a trivial cached op)
    x = jnp.zeros((8, 128), jnp.float32)
    rtt = timeit("tunnel RTT (tiny cached op)", lambda: np.asarray(x + 1.0))

    planes_dev = jnp.asarray(planes)
    np.asarray(jnp.sum(planes_dev[:, ::4096].astype(jnp.int32)))

    def h2d_only():
        d = jnp.asarray(planes)
        np.asarray(jnp.sum(d[:, ::4096].astype(jnp.int32)))

    timeit("H2D planes (20 MB) alone", h2d_only)

    def h2d_split(k):
        parts = [jnp.asarray(planes[:, i * (cap // k):(i + 1) * (cap // k)])
                 for i in range(k)]
        np.asarray(jnp.sum(jnp.stack(
            [jnp.sum(p[:, ::4096].astype(jnp.int32)) for p in parts])))

    timeit("H2D planes in 4 parallel parts", lambda: h2d_split(4))
    timeit("featurize_t (device-resident) + sum",
           lambda: np.asarray(jnp.sum(featurize_planes_t(planes_dev))))
    timeit("H2D planes + featurize_t + sum",
           lambda: np.asarray(jnp.sum(featurize_planes_t(jnp.asarray(planes)))))
    feats_t = featurize_planes_t(planes_dev)
    np.asarray(jnp.sum(feats_t))

    def make_chunk(nb, n_ctx_sites_per_batch=16384, rev=False, ctx="CpG"):
        n = nb * n_ctx_sites_per_batch
        # realistic density: candidate sites sit ~2.5-6 bp apart within the
        # packed reads, so a chunk's sites span a small buffer prefix
        span = min(int(n * 6.25), hi - lo)
        centers = np.sort(lo + rng.integers(0, span, n)).astype(np.int32)
        hk = kmer // 2
        bases, rels, idx = plan_groups((centers - hk).astype(np.int32), G, BL,
                                       kmer, cap, extent=CHUNK_LANES + 127)
        ng = len(bases)
        b128 = (bases // 128) * 128
        rels = rels + (bases - b128)[:, None]
        pad_g = nb * ngrp - ng
        assert pad_g >= 0, (ng, nb * ngrp)
        if pad_g:
            b128 = np.concatenate([b128, np.zeros(pad_g, np.int32)])
            rels = np.concatenate([rels, np.zeros((pad_g, G), np.int32)])
        return (jnp.asarray(b128.reshape(nb, ngrp)),
                jnp.asarray(rels.reshape(nb, ngrp, G)), rev,
                dict(kmer_size=kmer, compute_dtype=dtype,
                     spec=eng.models.specs[ctx], conv_impl="direct",
                     group=G, block_lanes=BL, interpret=False))

    results = {}
    for nb, rev, ctx in ((1, False, "CpG"), (8, False, "CpG"),
                         (12, False, "CpG"), (2, True, "CHH"),
                         (2, False, "CHH"), (24, True, "CHH"),
                         (24, False, "CHH")):
        b, r, rv, kw = make_chunk(nb, rev=rev, ctx=ctx)
        label = f"call chunk nb={nb} ctx={ctx} rev={rev}"
        results[(nb, rev, ctx)] = timeit(
            label, lambda: np.asarray(call_sites_pallas(
                eng.models.params[ctx], feats_t, b, r, rv, **kw)))

    for (a, b_), rev, ctx in (((1, 8), False, "CpG"), ((2, 24), True, "CHH"),
                              ((2, 24), False, "CHH")):
        if (a, rev, ctx) in results and (b_, rev, ctx) in results:
            per = (results[(b_, rev, ctx)] - results[(a, rev, ctx)]) / (b_ - a)
            fixed = results[(a, rev, ctx)] - a * per
            print(f"{ctx} rev={rev}: {per * 1e3:.2f} ms/batch, "
                  f"fixed/dispatch {fixed * 1e3:.1f} ms (incl RTT {rtt * 1e3:.0f})")


if __name__ == "__main__":
    main()
