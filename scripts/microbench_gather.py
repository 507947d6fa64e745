#!/usr/bin/env python3
"""Microbenchmark: decompose the per-site window pipeline on the live device.

Times candidate window-fetch formulations plus the CNN, each as ONE jitted
program that runs NB batches under lax.map and returns per-batch checksums
(so only scalars cross the device boundary; through the axon tunnel,
block_until_ready is unreliable and D2H of big tensors is slow).

Usage: python scripts/microbench_gather.py [--variants a,b,...] [--nb 16]
Variants:
  fetch_slice    vmapped dynamic_slice of (kmer, 8) rows   (current default)
  fetch_folded   vmapped dynamic_slice of (26, 128) rows   (same bytes)
  folded_full    fetch_folded + select-tree realign + mask/flip
  slice_full     gather_windows_slice (fetch + mask/flip)
  cnn            dnamodnet_apply on resident (B, 401, 8) windows
  pallas_slice   ops.gather.window_slices DMA kernel (spp=8)
  pallas_slice64 same with spp=64 (deeper DMA pipeline)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="fetch_slice,fetch_folded,folded_full,slice_full,cnn")
    ap.add_argument("--nb", type=int, default=16)
    ap.add_argument("--site-batch", type=int, default=16384)
    ap.add_argument("--rows", type=int, default=1 << 22)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/hifimeth_tpu_xla"))
    import jax
    import jax.numpy as jnp
    from functools import partial

    from hifimeth_tpu.constants import KMER_SIZE
    from hifimeth_tpu.features.windows import (featurize_planes,
                                               featurize_planes_folded,
                                               gather_windows_folded,
                                               gather_windows_slice)

    N, B, NB, K = args.rows, args.site_batch, args.nb, KMER_SIZE
    hk = K // 2
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 256, (5, N)).astype(np.uint8)
    planes[0] = rng.integers(0, 4, N)
    feats = featurize_planes(jnp.asarray(planes))
    folded = featurize_planes_folded(jnp.asarray(planes))
    centers = rng.integers(K, N - K, (NB, B)).astype(np.int32)
    strands = rng.integers(0, 2, (NB, B)).astype(np.uint8)
    rstart = np.zeros((NB, B), np.int32) + 8
    rend = np.zeros((NB, B), np.int32) + (N - 8)
    c_d, s_d, rs_d, re_d = map(jnp.asarray, (centers, strands, rstart, rend))

    def timed(name, fn, *xs):
        # warm (compile), then best-of-3
        out = np.asarray(fn(*xs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(*xs))
            best = min(best, time.perf_counter() - t0)
        per_batch = best / NB
        print(f"{name:16s} {best*1e3:8.1f} ms total  {per_batch*1e3:7.2f} ms/batch  "
              f"{B/per_batch/1e6:7.2f} Msites/s  (checksum {out.ravel()[0]:.3e})",
              flush=True)

    @jax.jit
    def fetch_slice(c):
        def one(cb):
            def s1(st):
                return jax.lax.dynamic_slice(feats, (st, 0), (K, feats.shape[1]))
            w = jax.vmap(s1)((cb - hk).astype(jnp.int32))
            return jnp.sum(w)
        return jax.lax.map(one, c)

    @jax.jit
    def fetch_folded(c):
        frows = (K + 15 + 15) // 16
        def one(cb):
            r0 = jnp.clip((cb - hk).astype(jnp.int32) // 16, 0,
                          folded.shape[0] - frows)
            def s1(r):
                return jax.lax.dynamic_slice(folded, (r, 0), (frows, 128))
            w = jax.vmap(s1)(r0)
            return jnp.sum(w)
        return jax.lax.map(one, c)

    @jax.jit
    def folded_full(c, s, rs, re):
        def one(b):
            w = gather_windows_folded(folded, *b)
            return jnp.sum(w)
        return jax.lax.map(one, (c, s, rs, re))

    @jax.jit
    def slice_full(c, s, rs, re):
        def one(b):
            w = gather_windows_slice(feats, *b)
            return jnp.sum(w)
        return jax.lax.map(one, (c, s, rs, re))

    variants = set(args.variants.split(","))
    if "fetch_slice" in variants:
        timed("fetch_slice", fetch_slice, c_d)
    if "fetch_folded" in variants:
        timed("fetch_folded", fetch_folded, c_d)
    if "folded_full" in variants:
        timed("folded_full", folded_full, c_d, s_d, rs_d, re_d)
    if "slice_full" in variants:
        timed("slice_full", slice_full, c_d, s_d, rs_d, re_d)

    if "cnn" in variants:
        from hifimeth_tpu.engine.call import default_model_dir
        from hifimeth_tpu.model.cnn import (conv_spec, dnamodnet_apply,
                                            load_params_npz)
        params_np = load_params_npz(os.path.join(default_model_dir(), "CpG.npz"))
        spec = conv_spec(params_np)
        params = jax.tree_util.tree_map(jnp.asarray, params_np)
        w0 = np.asarray(gather_windows_slice(feats, c_d[0], s_d[0], rs_d[0],
                                             re_d[0]))
        w_dev = jnp.asarray(w0)

        @jax.jit
        def cnn(w):
            def one(i):
                # iteration-dependent tweak prevents loop-invariant hoisting
                logits = dnamodnet_apply(params, w + i.astype(jnp.float32) * 1e-9,
                                         spec=spec)
                return jnp.sum(logits)
            return jax.lax.map(one, jnp.arange(NB))
        timed("cnn", cnn, w_dev)

    if "pallas_group" in variants:
        from hifimeth_tpu.ops.gather import group_windows
        G, R = 32, 1024
        NG = B // G
        # realistic workload: sorted sites ~2.5 rows apart (candidate-site
        # density of the call pipeline), grouped host-side
        bases = np.empty((NB, NG), np.int32)
        rels = np.empty((NB, NG, G), np.int32)
        for i in range(NB):
            starts = (K + np.cumsum(rng.integers(1, 5, B))).astype(np.int32)
            sg = starts.reshape(NG, G)
            b = np.minimum(sg[:, 0], N - R)
            bases[i] = b
            rels[i] = sg - b[:, None]
        assert rels.max() <= R - K and rels.min() >= 0
        b_d, r_d = jnp.asarray(bases), jnp.asarray(rels)

        @jax.jit
        def pallas_group(bs, rs):
            def one(b):
                w = group_windows(feats, b[0], b[1], G, R, K)
                return jnp.sum(w)
            return jax.lax.map(one, (bs, rs))
        timed("pallas_group", pallas_group, b_d, r_d)

    if "pallas_groupt" in variants:
        from hifimeth_tpu.features.windows import featurize_planes_t
        from hifimeth_tpu.ops.gather import group_windows_t
        G, R = 32, 2048
        NG = B // G
        ft = featurize_planes_t(jnp.asarray(planes))
        bases = np.empty((NB, NG), np.int32)
        rels = np.empty((NB, NG, G), np.int32)
        for i in range(NB):
            starts = (K + np.cumsum(rng.integers(1, 5, B))).astype(np.int32)
            sg = starts.reshape(NG, G)
            b = np.minimum((sg[:, 0] // 128) * 128, N - R)
            bases[i] = b
            rels[i] = sg - b[:, None]
        assert rels.max() <= R - 640 and rels.min() >= 0
        b_d, r_d = jnp.asarray(bases), jnp.asarray(rels)

        @jax.jit
        def pallas_groupt(bs, rs):
            def one(b):
                w = group_windows_t(ft, b[0], b[1], group=G, block_lanes=R)
                return jnp.sum(w[:, :, :K])
            return jax.lax.map(one, (bs, rs))
        timed("pallas_groupt", pallas_groupt, b_d, r_d)

    for name, spp in (("pallas_slice", 8), ("pallas_slice64", 64)):
        if name not in variants:
            continue
        from hifimeth_tpu.ops.gather import window_slices

        @partial(jax.jit, static_argnames=())
        def pallas_fetch(c, _spp=spp):
            def one(cb):
                w = window_slices(feats, (cb - hk).astype(jnp.int32), K,
                                  spp=_spp)
                return jnp.sum(w)
            return jax.lax.map(one, c)
        timed(name, pallas_fetch, c_d)


if __name__ == "__main__":
    main()
