#!/usr/bin/env python3
"""Ablation profile of the fused kernel: time stripped-down variants to
find where the 6.3 ms/batch goes (block conv1 | extraction | conv2 | deep).

Each variant is a copy of the kernel with later stages disabled.  Timing
protocol: nb=1 vs nb=8 difference, interleaved best-of.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/hifimeth_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hifimeth_tpu.ops import fused as F


def make_variant(stage: str):
    """stage: conv1 | extract | conv2 | full"""

    def kernel(bases_ref, rels_ref, feats_ref,
               w1m_ref, c1b_ref, t0_ref, tN_ref, c0c_ref, cN_ref,
               wk2, bm2, wk3, bm3, wk4, bm4, wk5, bm5,
               wk6, bm6, wk7, bm7, wk8, bm8,
               fcw0_ref, fcw1_ref, fcb1_ref, fcw2_ref, fcb2_ref,
               out_ref, blk, t1, pbank, eol, pk, pg, sems):
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        k1 = w1m_ref.shape[1] // 8
        lo = F._lo_chain(k1)
        a_last = 2 * (lo[0] - 1)

        def block_dma(i, slot):
            base = pl.multiple_of(bases_ref[i], 128)
            return pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(base, F.BLOCK_LANES)],
                blk.at[slot], sems.at[slot])

        @pl.when(g == 0)
        def _():
            block_dma(0, 0).start()

        @pl.when(g + 1 < ng)
        def _():
            block_dma(g + 1, (g + 1) % 2).start()

        slot = g % 2
        block_dma(g, slot).wait()

        x = blk[slot]
        pieces = [F._roll_l(x, k - 1) if k else pltpu.roll(x, 1, axis=1)
                  for k in range(k1)]
        BT = jnp.concatenate(pieces, axis=0)
        o1 = F._mm(w1m_ref[:], BT)
        t1[:, :] = o1.T
        pbank[0] = t1[0:F.BLOCK_LANES:4, :]
        pbank[1] = t1[1:F.BLOCK_LANES:4, :]
        pbank[2] = t1[2:F.BLOCK_LANES:4, :]
        pbank[3] = t1[3:F.BLOCK_LANES:4, :]
        if stage == "conv1":
            out_ref[0, :, :] = jnp.zeros((F.GROUP, 128), jnp.float32)
            return

        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        for sb in range(F.GROUP // F.PACK):
            def site_body(i, _):
                rel = rels_ref[g, sb * F.PACK + i]
                h = rel >> 2
                d = rel & 3
                for dd in range(4):
                    @pl.when(d == dd)
                    def _(dd=dd):
                        eol[0] = pbank[dd, pl.ds(h, 128), :]
                        if dd < 2:
                            eol[1] = pbank[dd + 2, pl.ds(h, 128), :]
                            hl = jnp.maximum(h - 1, 0)
                            B = pbank[dd + 2, pl.ds(hl, 128), :]
                            Bs = jnp.concatenate(
                                [jnp.zeros((1, 128), jnp.float32), B[:127]],
                                axis=0)
                            eol[2] = jnp.where(h > 0, B, Bs)
                        else:
                            eol[1] = pbank[dd - 2, pl.ds(h + 1, 128), :]
                            eol[2] = pbank[dd - 2, pl.ds(h, 128), :]
                if stage == "extract":
                    pk[pl.ds(i * 128, 128), :] = eol[0]
                    return 0

                def lane_col(idx):
                    a = pl.multiple_of((idx // 128) * 128, 128)
                    ch = blk[slot, :, pl.ds(a, 128)]
                    return pltpu.roll(ch, 128 - (idx - a), axis=1)[:, 0:1]

                im1 = (rel + F.BLOCK_LANES - 1) & (F.BLOCK_LANES - 1)
                xm1 = lane_col(im1)
                xp1 = lane_col(rel + F.KMER)
                c0 = jax.lax.dot_general(
                    xm1, t0_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + c0c_ref[:]
                cN = jax.lax.dot_general(
                    xp1, tN_ref[:], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + cN_ref[:]
                E = eol[0] - jnp.where(row128 == 0, 1.0, 0.0) * c0
                Oraw = eol[1]
                if a_last % 4 == 0:
                    E = E - jnp.where(row128 == a_last // 4, 1.0, 0.0) * cN
                else:
                    Oraw = Oraw - jnp.where(row128 == (a_last - 2) // 4,
                                            1.0, 0.0) * cN
                E = jnp.where(row128 < (lo[0] + 1) // 2,
                              jnp.maximum(E + c1b_ref[:], 0.0), 0.0)
                O = jnp.where(row128 < lo[0] // 2,
                              jnp.maximum(Oraw + c1b_ref[:], 0.0), 0.0)
                left = jnp.where((row128 < lo[0] // 2 + 1) & (row128 > 0),
                                 jnp.maximum(eol[2] + c1b_ref[:], 0.0), 0.0)
                o2 = (F._mm(left, wk2[0]) + F._mm(E, wk2[1])
                      + F._mm(O, wk2[2]) + bm2[:])
                o2 = jnp.maximum(o2, 0.0)
                o2 = jnp.where(row128 < lo[1], o2, 0.0)
                pk[pl.ds(i * 128, 128), :] = o2
                return 0

            jax.lax.fori_loop(0, F.PACK, site_body, 0)
            if stage == "conv2":
                continue
            bufs = [pk, pg]
            wks = (wk3, wk4, wk5, wk6, wk7, wk8)
            bms = (bm3, bm4, bm5, bm6, bm7, bm8)
            for li in range(6):
                s_in, s_out = F.STRIDES[li], F.STRIDES[li + 1]
                xv = F._conv_step(bufs[li % 2], F.PACK * s_in, s_in,
                                  wks[li], bms[li], lo[li + 2], s_out)
                bufs[(li + 1) % 2][0:F.PACK * s_out, :] = xv
            h0 = pk[0:F.PACK * 2:2, :]
            h1 = pk[1:F.PACK * 2:2, :]
            f = (F._mm(h0, fcw0_ref[:]) + F._mm(h1, fcw1_ref[:])
                 + fcb1_ref[:])
            f = jnp.maximum(f, 0.0)
            logits = F._mm(f, fcw2_ref[:]) + fcb2_ref[:]
            out_ref[0, sb * F.PACK:(sb + 1) * F.PACK, :] = logits
        if stage == "conv2":
            out_ref[0, :, :] = jnp.zeros((F.GROUP, 128), jnp.float32)

    @partial(jax.jit, static_argnames=())
    def fwd(prep, feats_t, bases_b, rels_b):
        def one(batch):
            # reduce on device: returning the logits tensor would ship
            # ~17 MB/batch D2H through the tunnel and swamp the timing
            return jnp.sum(fwd_one(prep, feats_t, *batch))
        return jnp.sum(jax.lax.map(one, (bases_b, rels_b)))

    def fwd_one(prep, feats_t, bases, rels):
        ng = bases.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(ng,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 25,
            out_specs=pl.BlockSpec((1, F.GROUP, 128), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 8, F.BLOCK_LANES), feats_t.dtype),
                pltpu.VMEM((F.BLOCK_LANES, 128), jnp.float32),
                pltpu.VMEM((4, F.BLOCK_LANES // 4, 128), jnp.float32),
                pltpu.VMEM((3, 128, 128), jnp.float32),
                pltpu.VMEM((F.PACK * 128, 128), jnp.float32),
                pltpu.VMEM((F.PACK * 64, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ])
        weights = [prep["w1m"], prep["c1bias"], prep["w1tap0"],
                   prep["w1tapN"], prep["corr0c"], prep["corrNc"]]
        for wk, bm in zip(prep["wm"], prep["bm"]):
            weights += [wk, bm]
        weights += [prep["fcw0"], prep["fcw1"], prep["fcb1"],
                    prep["fcw2"], prep["fcb2"]]
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ng, F.GROUP, 128), jnp.float32),
        )(bases.astype(jnp.int32), rels.astype(jnp.int32), feats_t, *weights)
        return out

    return fwd


def main():
    from hifimeth_tpu.engine.call import default_model_dir
    from hifimeth_tpu.features.windows import featurize_planes_t
    from hifimeth_tpu.model.cnn import load_params_npz
    from hifimeth_tpu.ops.gather import CHUNK_LANES, plan_groups

    cap = 1 << 21
    rng = np.random.default_rng(3)
    planes = np.zeros((5, cap), np.uint8)
    planes[0].fill(255)
    lo_, hi_ = 401, cap - 401
    planes[0, lo_:hi_] = rng.integers(0, 4, hi_ - lo_)
    planes[1:, lo_:hi_] = rng.integers(0, 256, (4, hi_ - lo_))
    feats_t = featurize_planes_t(jnp.asarray(planes))
    np.asarray(jax.jit(jnp.sum)(feats_t))
    prep = F.prepare_fused_params(load_params_npz(
        os.path.join(default_model_dir(), "CpG.npz")))
    SB = 8192
    ngrp = SB // F.GROUP

    def make_chunk(nb):
        n = nb * SB
        span = min(int(n * 3.3), hi_ - lo_)
        centers = np.sort(lo_ + rng.integers(0, span, n)).astype(np.int32)
        bases, rels, _ = plan_groups((centers - 200).astype(np.int32),
                                     F.GROUP, F.BLOCK_LANES, 401, cap,
                                     extent=CHUNK_LANES + 127)
        b128 = (bases // 128) * 128
        rels = rels + (bases - b128)[:, None]
        pad_g = nb * ngrp - len(bases)
        if pad_g > 0:
            b128 = np.concatenate([b128, np.zeros(pad_g, np.int32)])
            rels = np.concatenate([rels, np.zeros((pad_g, F.GROUP), np.int32)])
        return (jnp.asarray(b128[:nb * ngrp].reshape(nb, ngrp)),
                jnp.asarray(rels[:nb * ngrp].reshape(nb, ngrp, F.GROUP)))

    chunks = {nb: make_chunk(nb) for nb in (1, 8)}
    stages = sys.argv[1:] or ["conv1", "extract", "conv2", "full"]
    fns = {s: make_variant(s) for s in stages}
    for s, fn in fns.items():
        for nb in (1, 8):
            b, r = chunks[nb]
            np.asarray(fn(prep, feats_t, b, r))       # compile+warm
    times = {s: {1: float("inf"), 8: float("inf")} for s in stages}
    for _ in range(6):
        for s, fn in fns.items():
            for nb in (1, 8):
                b, r = chunks[nb]
                t0 = time.perf_counter()
                np.asarray(fn(prep, feats_t, b, r))
                times[s][nb] = min(times[s][nb], time.perf_counter() - t0)
    for s in stages:
        t = times[s]
        per = (t[8] - t[1]) / 7
        print(f"{s:8s}: {per*1e3:6.2f} ms/batch", file=sys.stderr)


if __name__ == "__main__":
    main()
