#!/usr/bin/env python3
"""Probe which ops Mosaic accepts inside Pallas TPU kernels (round-5 fused
CNN kernel design).  Each probe compiles + runs a tiny kernel and checks
numerics vs numpy.  Run probes one at a time: a runtime kernel fault can
wedge the remote TPU worker for ~60 s (docs/BENCHMARKS.md).

Usage: python scripts/probe_mosaic_ops.py [probe ...]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hifimeth_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, want, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(f)(x))
        ok = np.allclose(got, want, atol=1e-4)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'} "
              f"(max |d| {np.abs(got - want).max():.2e})")
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")
        if os.environ.get("PROBE_VERBOSE"):
            traceback.print_exc()
        return False


def main():
    which = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    xs = rng.normal(size=(256, 128)).astype(np.float32)

    def has(n):
        return not which or n in which

    if has("lane_stride"):
        run("lane_stride  y=x[:, 0::2]",
            lambda i, o: o.__setitem__(slice(None), i[:, 0::2]),
            x, x[:, 0::2], (8, 256))
    if has("lane_reshape"):
        def k(i, o):
            o[:] = i[:].reshape(8, 256, 2)[:, :, 0]
        run("lane_reshape y=x.reshape(8,256,2)[:,:,0]", k, x,
            x.reshape(8, 256, 2)[:, :, 0], (8, 256))
    if has("sub_stride"):
        run("sub_stride   y=x[0::2, :]",
            lambda i, o: o.__setitem__(slice(None), i[0::2, :]),
            xs, xs[0::2, :], (128, 128))
    if has("sub_reshape"):
        def k(i, o):
            o[:] = i[:].reshape(128, 2, 128)[:, 0, :]
        run("sub_reshape  y=x.reshape(128,2,128)[:,0,:]", k, xs,
            xs.reshape(128, 2, 128)[:, 0, :], (128, 128))
    if has("transpose"):
        def k(i, o):
            o[:] = i[:].T
        run("transpose    y=x.T (256,128)->(128,256)", k, xs, xs.T,
            (128, 256))
    if has("matmul"):
        w = rng.normal(size=(128, 88)).astype(np.float32)
        p = rng.normal(size=(88, 256)).astype(np.float32)

        def k(wi, pi, o):
            o[:] = jnp.dot(wi[:], pi[:], preferred_element_type=jnp.float32)
        try:
            f = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
            got = np.asarray(jax.jit(f)(w, p))
            ok = np.allclose(got, w @ p, atol=1e-2)
            print(f"matmul (128,88)@(88,256): {'OK' if ok else 'WRONG'} "
                  f"(max |d| {np.abs(got - w @ p).max():.2e})")
        except Exception as e:  # noqa: BLE001
            print(f"matmul: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]})")
    if has("concat_sub"):
        def k(i, o):
            a = i[:, 0:128]
            b = i[:, 128:256]
            o[:] = jnp.concatenate([a.T, b.T], axis=0)
        run("concat_sub   stack 2 transposed halves along sublanes", k, x,
            np.concatenate([x[:, 0:128].T, x[:, 128:256].T], axis=0),
            (256, 8))
    if has("roll"):
        def k(i, o):
            o[:] = pltpu.roll(i[:], 511, axis=1)   # left-rotate by 1
        run("roll         pltpu.roll lane rotate", k, x,
            np.roll(x, -1, axis=1), (8, 512))


if __name__ == "__main__":
    main()
