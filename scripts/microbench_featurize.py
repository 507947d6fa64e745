#!/usr/bin/env python3
"""Featurize-variant microbenchmark: where do 165 ms go on the 4 Mi table?

Variants of featurize_planes_t compared on the live backend, plus a 256-code
exactness check of the arithmetic codeV1 decode against the table (the
parity contract requires bit-identical features).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from hifimeth_tpu.constants import CODEV1_TO_FRAME_NORM
    from hifimeth_tpu.engine.call import enable_compilation_cache
    from hifimeth_tpu.features.windows import featurize_planes_t

    enable_compilation_cache()
    cap = 1 << 22
    rng = np.random.default_rng(0)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    planes[0, 401:cap - 401] = rng.integers(0, 4, cap - 802)
    planes[1:, 401:cap - 401] = rng.integers(0, 256, (4, cap - 802))
    planes_dev = jax.device_put(planes)
    np.asarray(jnp.sum(planes_dev[:, ::4096].astype(jnp.int32)))

    def codev1_arith(c_u8, dtype=jnp.float32):
        c = c_u8.astype(jnp.float32)
        v = jnp.where(c < 64, c,
                      jnp.where(c < 128, 2.0 * c - 64.0,
                                jnp.where(c < 192, 4.0 * c - 320.0,
                                          8.0 * c - 1088.0)))
        return (v / 952.0).astype(dtype)

    @partial(jax.jit, static_argnames=("dtype",))
    def feat_arith(planes, dtype=jnp.float32):
        codes = planes[0]
        onehot = (codes[None, :] == jnp.arange(4, dtype=codes.dtype)[:, None])
        kin = codev1_arith(planes[1:5], dtype)
        return jnp.concatenate([onehot.astype(dtype), kin], axis=0)

    @jax.jit
    def feat_gather_bf16(planes):
        codes = planes[0]
        onehot = (codes[None, :] == jnp.arange(4, dtype=codes.dtype)[:, None])
        table = jnp.asarray(CODEV1_TO_FRAME_NORM).astype(jnp.bfloat16)
        kin = table[planes[1:5]]
        return jnp.concatenate([onehot.astype(jnp.bfloat16), kin], axis=0)

    # exactness of the arithmetic decode on THIS backend, all 256 codes
    codes = np.arange(256, dtype=np.uint8)
    got = np.asarray(codev1_arith(jnp.asarray(codes)))
    want = np.asarray(CODEV1_TO_FRAME_NORM)
    neq = (got != want).sum()
    print(f"arith codeV1 vs table: {256 - neq}/256 bit-equal "
          f"(max abs diff {np.abs(got - want).max():.3e})")

    def timeit(label, fn, reps=4):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best * 1e3:9.1f} ms")
        return best

    timeit("table-gather f32 (current)",
           lambda: np.asarray(jnp.sum(featurize_planes_t(planes_dev))))
    timeit("arith f32",
           lambda: np.asarray(jnp.sum(feat_arith(planes_dev))))
    timeit("arith bf16",
           lambda: np.asarray(jnp.sum(feat_arith(planes_dev, jnp.bfloat16)
                                      .astype(jnp.float32))))
    timeit("table-gather bf16",
           lambda: np.asarray(jnp.sum(feat_gather_bf16(planes_dev)
                                      .astype(jnp.float32))))


if __name__ == "__main__":
    main()
