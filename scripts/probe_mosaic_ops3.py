#!/usr/bin/env python3
"""Round-3 Mosaic probes: final patterns for the fused CNN kernel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hifimeth_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run2(name, kernel, inputs, want, out_shape, atol=1e-4):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(f)(*inputs))
        d = np.abs(got - want).max()
        print(f"{name}: {'OK' if d <= atol else 'WRONG'} (max |d| {d:.2e})")
        return d <= atol
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:180]})")
        return False


def main():
    which = set(sys.argv[1:])
    rng = np.random.default_rng(2)

    def has(n):
        return not which or n in which

    x = rng.normal(size=(256, 128)).astype(np.float32)
    if has("patch3b"):
        # conv-K3 patch build: E = x[0::2], O = x[1::2], left = O shifted
        # down one sublane with a zero row; lane-concat 3x(128,128)
        def k(i, o):
            xm = i[:]
            E = xm[0::2, :]
            O = xm[1::2, :]
            left = jnp.concatenate([jnp.zeros((1, 128), jnp.float32),
                                    O[:127, :]], axis=0)
            o[:] = jnp.concatenate([left, E, O], axis=1)
        E, O = x[0::2], x[1::2]
        left = np.concatenate([np.zeros((1, 128), np.float32), O[:127]], 0)
        run2("patch3b  E/O strided + shift + lane-concat 3x128", k, [x],
             np.concatenate([left, E, O], axis=1), (128, 384))

    w = rng.normal(size=(8, 256)).astype(np.float32)
    if has("stack11"):
        # conv1 tap stack: sublane-concat of 11 lane-rolled (8, 256) pieces
        def k(i, o):
            xm = i[:]
            pieces = [pltpu.roll(xm, (256 - r) % 256, axis=1)
                      for r in range(11)]
            o[:] = jnp.concatenate(pieces, axis=0)
        want = np.concatenate([np.roll(w, -r, axis=1) for r in range(11)], 0)
        run2("stack11  sublane-concat of 11 lane-rolled (8,256)", k, [w],
             want, (88, 256))

    if has("conv1mm"):
        # stack -> matmul (128, 88) @ (88, 256)
        W = rng.normal(size=(128, 88)).astype(np.float32) * 0.1

        def k(i, wi, o):
            xm = i[:]
            pieces = [pltpu.roll(xm, (256 - r) % 256, axis=1)
                      for r in range(11)]
            B = jnp.concatenate(pieces, axis=0)
            o[:] = jnp.dot(wi[:], B, preferred_element_type=jnp.float32)
        B = np.concatenate([np.roll(w, -r, axis=1) for r in range(11)], 0)
        run2("conv1mm  tap-stack matmul", k, [w, W], W @ B, (128, 256),
             atol=0.05)

    if has("store8"):
        # packed scratch: store (8, 128) computed rows at static sublane
        # offsets of a bigger out (sub-batch packing for deep layers)
        def k(i, o):
            xm = i[:]
            for s in range(4):
                o[s * 32:s * 32 + 8, :] = xm[s * 8:s * 8 + 8, :] * 2.0
                o[s * 32 + 8:s * 32 + 32, :] = jnp.zeros((24, 128),
                                                         jnp.float32)
        want = np.zeros((128, 128), np.float32)
        for s in range(4):
            want[s * 32:s * 32 + 8] = x[s * 8:s * 8 + 8] * 2.0
        run2("store8   static-offset row stores", k, [x], want, (128, 128))

    if has("dyn_sub"):
        # dynamic sublane read: site extraction uses pl.ds on sublanes
        idx = np.array([[7]], np.int32)

        def k(ii, i, o):
            st = ii[0, 0]
            o[:] = i[pl.ds(st, 128), :]
        try:
            f = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
            got = np.asarray(jax.jit(f)(idx, x))
            d = np.abs(got - x[7:135]).max()
            print(f"dyn_sub  dynamic sublane ds read: "
                  f"{'OK' if d == 0 else 'WRONG'} (max |d| {d:.2e})")
        except Exception as e:  # noqa: BLE001
            print(f"dyn_sub: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:180]})")


if __name__ == "__main__":
    main()
