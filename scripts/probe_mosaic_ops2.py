#!/usr/bin/env python3
"""Round-2 Mosaic probes: the exact patterns the fused CNN kernel needs."""
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
    rng = np.random.default_rng(1)

    def has(n):
        return not which or n in which

    # K=3 stride-2 conv patch build: x (200, 128) -> patches (104, 384)
    x = rng.normal(size=(200, 128)).astype(np.float32)
    if has("patch3"):
        def k(i, o):
            xm = i[:]
            lo = xm[0:199:2, :]            # x[2j] rows, j<100
            left = jnp.concatenate(
                [jnp.zeros((1, 128), jnp.float32), xm[1:199:2, :][:99]], axis=0)
            right = xm[1:200:2, :][:100]
            o[:] = jnp.concatenate([left[:100], lo[:100], right], axis=1)
        left_w = np.concatenate([np.zeros((1, 128), np.float32),
                                 x[1:199:2][:99]], axis=0)
        want = np.concatenate([left_w[:100], x[0:199:2][:100], x[1:200:2][:100]],
                              axis=1)
        run2("patch3   K3 stride2 lane-concat of strided slices", k, [x],
             want, (100, 384))

    # reshape pair-merge (512, 8) -> (256, 16)
    y = rng.normal(size=(512, 8)).astype(np.float32)
    if has("pairmerge"):
        def k(i, o):
            o[:] = i[:].reshape(256, 16)
        run2("pairmerge reshape (512,8)->(256,16)", k, [y],
             y.reshape(256, 16), (256, 16))

    # lane concat of narrow 8-lane pieces (direct conv1 patch build)
    if has("concat8"):
        def k(i, o):
            xs = i[:]
            o[:] = jnp.concatenate([xs[s:s + 100, :] for s in range(6)], axis=1)
        want = np.concatenate([y[s:s + 100] for s in range(6)], axis=1)
        run2("concat8  lane-concat of six (100,8) pieces", k, [y],
             want, (100, 48))

    # full conv1 numerics: window (8, 512) channels-sublane ->
    # transpose -> pair-merge -> 6-pair patches -> matmul vs numpy conv
    if has("conv1"):
        KM = 401
        w8 = rng.normal(size=(8, 512)).astype(np.float32)
        w8[:, KM:] = rng.normal(size=(8, 512 - KM))  # garbage lanes
        W = rng.normal(size=(11, 8, 128)).astype(np.float32) * 0.1
        Lo = (KM + 2 - 11) // 2 + 1                 # 197

        # numpy reference: zero-pad (1,1), stride 2
        xw = np.zeros((KM + 2, 8), np.float32)
        xw[1:KM + 1] = w8[:, :KM].T
        want = np.zeros((Lo, 128), np.float32)
        for j in range(Lo):
            seg = xw[2 * j:2 * j + 11]              # (11, 8)
            want[j] = np.einsum("kc,kco->o", seg, W)

        # host-side weight rearrange to pair layout:
        # padded input p[t] = xw[t], t in [0, 403); pairs P[i]=(p[2i],p[2i+1])
        # out[j] taps p[2j .. 2j+10] -> pairs j..j+5
        # patches[j] = concat(P[j], .., P[j+5]) (96 lanes)
        Wp = np.zeros((96, 128), np.float32)
        for k_ in range(11):
            pair, elem = k_ // 2, k_ % 2
            Wp[pair * 16 + elem * 8:pair * 16 + elem * 8 + 8] = W[k_]

        def k(i, wp, o):
            xm = i[:]                                # (8, 512)
            mask = jax.lax.broadcasted_iota(jnp.int32, (8, 512), 1) < KM
            xm = jnp.where(mask, xm, 0.0)
            xt = xm.T                                # (512, 8)
            # zero-pad by 1 position at front: roll down 1 sublane + zero row0
            xp = jnp.concatenate([jnp.zeros((1, 8), jnp.float32),
                                  xt[:511, :]], axis=0)   # p[0..511]
            pairs = xp.reshape(256, 16)
            patches = jnp.concatenate(
                [pairs[s:s + 200, :] for s in range(6)], axis=1)  # (200, 96)
            o[:] = jnp.dot(patches[:Lo], wp[:],
                           preferred_element_type=jnp.float32)

        run2("conv1    full window->pairs->patches->matmul", k, [w8, Wp],
             want, (Lo, 128), atol=0.15)


if __name__ == "__main__":
    main()
