"""Fully-fused Pallas TPU kernel: window gather + DNAModNet forward in VMEM.

The round-4 production path (ops/gather.group_windows_t + XLA convs) writes
the (B, 8, 512) window tensor and every conv activation to HBM between ops;
at 8192 sites/batch that is hundreds of MB of intermediate traffic and the
measured ceiling is 2.4 ms/batch = 37% MFU (docs/BENCHMARKS.md roofline).
This kernel keeps the ENTIRE per-site network - gather, bn0, conv1..conv8,
fc1, fc2 (reference model: /root/reference/training/model_cnn.py:8-85, with
the shipped ks1=11 geometry) - in VMEM and writes only (B, 128) logit rows.

The core idea is OVERLAP SHARING: candidate sites are ~2.5 bp apart, so the
401-wide windows of one 32-site group overlap ~100x.  conv1 is therefore
computed ONCE per block at stride 1 over all 2048 block anchors (one
(128, 88) @ (88, 2048) matmul ~= 1.4 MFLOP/site instead of 4.4+ per site),
transposed once, and phase-split into 4 anchor-parity banks; each site then
reads its conv2 inputs as contiguous dynamic slices of the banks.  The
reference's per-window ZERO padding (torch Conv1d pad=1 pads the window,
not the read) differs from block values only at each window's edge taps, so
two per-site rank-1 corrections (output columns j=0 and j=196) restore
exact per-window semantics before the conv1 bias/ReLU is applied.

Mosaic constraints that shaped the implementation
(scripts/probe_mosaic_ops*.py):
 - strided slicing works on REFS only (never values) and only on sublanes;
   dynamic LANE indices must be 128-aligned (read aligned chunk + roll);
 - lane-concat needs 128-lane-aligned pieces; channel dims are zero-padded
   to 128 so every deep conv step is matmuls with K in {128, 384};
 - no in-kernel flip: reverse-strand sites use a PRE-REVERSED table
   (reverse_table) and mirrored window starts.

conv2 runs as three M=2048 matmuls over all GROUP sites' staged raw E/O
phases (async VMEM DMAs); the two window-edge conv2 rows per site are
recomputed exactly from static rows of the staged tensors (one strided
gather each, batched matmuls).  Deep layers (conv3..conv8 + fc) process
all GROUP sites per matmul at power-of-two per-site strides
(128, 64, 32, 16, 8, 4, 2); iota masks zero pad rows and each site's
first left-tap row.

STATUS (round 5, measured on the v5e tunnel - docs/BENCHMARKS.md): the
kernel is CORRECT (u8 probs within 4 of the f32 XLA path, mean 0.16,
MM strings identical e2e) but at 3.9-4.1 ms per 8192-site batch it LOSES
to the group_windows_t + XLA conv path (2.5-2.7 ms).  Stage ablation
(scripts/profile_fused.py): block conv1 + banks 0.2 ms, per-site E/O
staging ~1.5 ms (copy-engine bandwidth: 1 GB/batch of per-site phase
materialization), conv2+fixes ~1.0 ms, deep+fc ~1.1 ms (launch/VPU
bound).  The remaining route (block-level conv2..conv4 with cascaded
per-site edge fixes, staging only 25-row conv5 inputs) is estimated at
~2.2-2.5 ms (anchor-padding FLOPs replace staging bandwidth) -
roughly a tie, not pursued.  Kept as an opt-in
`--gather-impl fused` experimental mode, gated by a bench selfcheck leg.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KMER = 401
GROUP = 32                # sites per HBM block DMA (matches gather kernel)
BLOCK_LANES = 2048
#: per-site sublane strides of the packed deep-layer tensors (conv3 input
#: through conv8 output); valid row counts are derived from the conv1
#: kernel size (shipped models: ks1=11 for CpG/CHG -> Lo1=197, ks1=13 for
#: CHH -> Lo1=196) and always fit these power-of-two strides
STRIDES = (128, 64, 32, 16, 8, 4, 2)


def _lo_chain(k1: int) -> list[int]:
    """Per-layer output lengths [Lo1..Lo8] for conv1 kernel size k1."""
    lo = [(KMER + 2 - k1) // 2 + 1]
    for _ in range(7):
        lo.append((lo[-1] - 1) // 2 + 1)
    return lo


# ---------------------------------------------------------------------------
# Host-side weight preparation


def prepare_fused_params(params) -> dict:
    """Rearrange an inference params pytree (model/cnn.py layout) into the
    matmul-layout arrays the fused kernel consumes.  All channel dims are
    zero-padded to 128; bn0 is folded into conv1 (affine per channel)."""
    convs = params["convs"]
    if len(convs) != 8:
        raise ValueError("fused kernel supports the 8-conv DNAModNet only")
    w1 = np.asarray(convs[0]["w"], np.float32)          # (K1, 8, 128) WIO
    k1 = w1.shape[0]
    if w1.shape not in ((11, 8, 128), (13, 8, 128)):
        raise ValueError(f"unexpected conv1 geometry {w1.shape}")
    scale = np.asarray(params["bn0"]["scale"], np.float32)[:8]
    shift = np.asarray(params["bn0"]["shift"], np.float32)[:8]
    w1s = w1 * scale[None, :, None]                     # bn scale folded
    w1m = np.zeros((128, 8 * k1), np.float32)
    for k in range(k1):
        w1m[:, 8 * k:8 * k + 8] = w1s[k].T              # (128, 8)
    # bn shift folded into the conv1 bias: every tap contributes
    # w1[k,:,:].T @ shift; window-edge outputs j=0 / j=Lo1-1 lose one tap
    # (zero pad), handled per site together with the data-side correction
    tap = np.einsum("kco,c->ko", w1, shift)             # (K1, 128)
    c1bias = (tap.sum(axis=0)
              + np.asarray(convs[0]["b"], np.float32)).reshape(1, 128)
    prep = {
        "w1m": w1m,
        "c1bias": c1bias,
        "w1tap0": np.ascontiguousarray(w1s[0]),         # (8, 128)
        "w1tapN": np.ascontiguousarray(w1s[k1 - 1]),
        "corr0c": tap[0].reshape(1, 128),
        "corrNc": tap[k1 - 1].reshape(1, 128),
        "wm": [], "bm": [],
    }
    for li in range(1, 8):
        w = np.asarray(convs[li]["w"], np.float32)      # (3, Cin, Cout)
        b = np.asarray(convs[li]["b"], np.float32)
        K, cin, cout = w.shape
        assert K == 3, (li, w.shape)
        # three separate (128, 128) tap matrices: left = x[2j-1], mid =
        # x[2j], right = x[2j+1]; no patch concat needed in-kernel
        wk = np.zeros((3, 128, 128), np.float32)
        for k in range(3):
            wk[k, :cin, :cout] = w[k]
        bm = np.zeros((1, 128), np.float32)
        bm[0, :cout] = b
        prep["wm"].append(wk)
        prep["bm"].append(bm)
    # fc1: torch flatten of (C=64, L=2) is c-major (index c*2 + l)
    fw = np.asarray(params["fc1"]["w"], np.float32)     # (128, 256)
    f0 = np.zeros((128, 256), np.float32)
    f1 = np.zeros((128, 256), np.float32)
    f0[:64] = fw[0::2]                                  # l = 0 rows
    f1[:64] = fw[1::2]                                  # l = 1 rows
    prep["fcw0"] = f0
    prep["fcw1"] = f1
    prep["fcb1"] = np.asarray(params["fc1"]["b"], np.float32).reshape(1, 256)
    f2 = np.asarray(params["fc2"]["w"], np.float32)     # (256, 2)
    fcw2 = np.zeros((256, 128), np.float32)
    fcw2[:, :2] = f2
    fcb2 = np.zeros((1, 128), np.float32)
    fcb2[0, :2] = np.asarray(params["fc2"]["b"], np.float32)
    prep["fcw2"] = fcw2
    prep["fcb2"] = fcb2
    return {k: (jnp.asarray(v) if not isinstance(v, list)
                else [jnp.asarray(a) for a in v]) for k, v in prep.items()}


@jax.jit
def reverse_table(feats_t: jax.Array) -> jax.Array:
    """Pre-reversed feature table for reverse-strand sites: lane flip +
    the complement/swap channel permutation (features/windows.py
    REV_CHANNEL_PERM).  A reverse site's window is then a FORWARD
    extraction at mirrored coordinates - no in-kernel flip needed."""
    perm = jnp.asarray(np.array([3, 2, 1, 0, 6, 7, 4, 5], np.int32))
    return feats_t[perm, ::-1]


# ---------------------------------------------------------------------------
# Kernel


def _roll_l(x, r):
    """Left-rotate lanes by r (static)."""
    L = x.shape[-1]
    return pltpu.roll(x, (L - r) % L, axis=1)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _conv_step(src, n_rows, s_in, wk_ref, b_ref, v_out, s_out):
    """One stride-2 K=3 conv over a packed scratch ref (positions on
    sublanes, site s at rows [s*s_in, (s+1)*s_in), invalid rows zero).
    out = left @ W0 + mid @ W1 + right @ W2 - three full-depth matmuls,
    no patch materialization."""
    half = n_rows // 2
    E = src[0:n_rows:2, :]                       # x[2j]
    O = src[1:n_rows:2, :]                       # x[2j+1]
    left = jnp.concatenate([jnp.zeros((1, 128), jnp.float32), O[:half - 1]],
                           axis=0)               # x[2j-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (half, 128), 0)
    left = jnp.where((row & (s_in // 2 - 1)) == 0, 0.0, left)
    out = (_mm(left, wk_ref[0]) + _mm(E, wk_ref[1]) + _mm(O, wk_ref[2])
           + b_ref[:])
    out = jnp.maximum(out, 0.0)
    return jnp.where((row & (s_out - 1)) < v_out, out, 0.0)


def _fused_kernel(bases_ref, rels_ref,           # scalar prefetch (SMEM)
                  feats_ref,                     # (8, N) table ANY/HBM
                  w1m_ref, c1b_ref, t0_ref, tN_ref, c0c_ref, cN_ref,
                  wk2, bm2, wk3, bm3, wk4, bm4, wk5, bm5,
                  wk6, bm6, wk7, bm7, wk8, bm8,
                  fcw0_ref, fcw1_ref, fcb1_ref, fcw2_ref, fcb2_ref,
                  out_ref,                       # (1, GROUP, 128) VMEM
                  blk, t1, pbank, es, os_, c0s, cNs,
                  fixr, pk, pg, sems, stsem, *, stage: str = "full"):
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    k1 = w1m_ref.shape[1] // 8                   # 11 (CpG/CHG) or 13 (CHH)
    lo = _lo_chain(k1)                           # [Lo1..Lo8]
    a_last = 2 * (lo[0] - 1)                     # anchor of output j=Lo1-1

    def block_dma(i, slot):
        base = pl.multiple_of(bases_ref[i], 128)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, BLOCK_LANES)],
            blk.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        block_dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        block_dma(g + 1, (g + 1) % 2).start()

    slot = g % 2
    block_dma(g, slot).wait()

    # ---- block-level stride-1 conv1 over all 2048 anchors --------------
    # BT rows [8k:8k+8] = block lanes shifted so lane a holds tap
    # x[a + k - 1]; k=0 right-rotates by 1 (wrap lane is corrected or
    # unused per site), left-rotations wrap into anchors > 1646 which no
    # site reads (rel <= 1535, window extent 401).
    x = blk[slot]                                # (8, 2048)
    pieces = [_roll_l(x, k - 1) if k else pltpu.roll(x, 1, axis=1)
              for k in range(k1)]
    BT = jnp.concatenate(pieces, axis=0)         # (8*K1, 2048)
    o1 = _mm(w1m_ref[:], BT)                     # (128, 2048) RAW conv1
    t1[:, :] = o1.T                              # raw anchors on sublanes
    # anchor-parity banks hold RAW conv1 (activation happens at conv2's
    # operand prep): staging raw lets every per-site fix ingredient be a
    # STATIC row of the staged tensors, gathered for all 32 sites with one
    # strided read each - the v3/v4 per-site row work vanishes.
    # bank d row m = raw conv1 at anchor 4m + d.
    pbank[0] = t1[0:BLOCK_LANES:4, :]
    pbank[1] = t1[1:BLOCK_LANES:4, :]
    pbank[2] = t1[2:BLOCK_LANES:4, :]
    pbank[3] = t1[3:BLOCK_LANES:4, :]

    last2 = lo[1] - 1                            # conv2's last valid row
    if stage == "block":                         # profiling ablation
        out_ref[0, :, :] = jnp.zeros((GROUP, 128), jnp.float32)
        return

    def stage_dma(i, d, h, which):
        """Async VMEM->VMEM copy of one site's E or O tile on the DMA
        engine, overlapped with the per-site correction math."""
        dst = (es if which == 0 else os_)
        return pltpu.make_async_copy(
            pbank.at[d, pl.ds(h, 128), :],
            dst.at[pl.ds(i * 128, 128), :],
            stsem.at[which])

    def site_body(i, _):
        rel = rels_ref[g, i]
        h = rel >> 2
        d = rel & 3
        # ---- stage raw E/O ------------------------------------------
        # E[j'] = x2raw[2j'] = conv1[rel + 4j']  -> bank d, offset h
        # O[j'] = x2raw[2j'+1] = conv1[rel+2+4j'] -> bank (d+2)&3,
        #                                            offset h + (d >= 2)
        stage_dma(i, d, h, 0).start()
        stage_dma(i, (d + 2) & 3, h + (d >= 2), 1).start()

        # ---- per-site pad-tap corrections (c0 at j=0, cN at j=Lo1-1):
        # the only values that cannot be batched (dynamic block lanes)
        def lane_col(idx):
            a = pl.multiple_of((idx // 128) * 128, 128)
            ch = blk[slot, :, pl.ds(a, 128)]
            return pltpu.roll(ch, 128 - (idx - a), axis=1)[:, 0:1]

        im1 = (rel + BLOCK_LANES - 1) & (BLOCK_LANES - 1)
        c0s[pl.ds(i, 1), :] = (
            jnp.sum(lane_col(im1) * t0_ref[:], axis=0, keepdims=True)
            + c0c_ref[:])
        cNs[pl.ds(i, 1), :] = (
            jnp.sum(lane_col(rel + KMER) * tN_ref[:], axis=0, keepdims=True)
            + cN_ref[:])
        return 0

    jax.lax.fori_loop(0, GROUP, site_body, 0)

    # drain the staging DMAs (wait decrements one copy's worth each call;
    # the descriptor's src/dst only size the wait, as in ops/gather)
    def drain(i, _):
        stage_dma(0, 0, 0, 0).wait()
        stage_dma(0, 0, 0, 1).wait()
        return 0

    jax.lax.fori_loop(0, GROUP, drain, 0)

    if stage == "stage":                         # profiling ablation
        out_ref[0, :, :] = jnp.zeros((GROUP, 128), jnp.float32)
        return

    def act(v):
        return jnp.maximum(v + c1b_ref[:], 0.0)

    # ---- conv2 over ALL staged sites, in 2 halves (VMEM transients);
    # activation (relu(raw + bias)) folds into the operand prep ---------
    HALF = GROUP * 128 // 2
    rows2k = jax.lax.broadcasted_iota(jnp.int32, (HALF, 128), 0)
    for hb in range(2):
        Ev = act(es[hb * HALF:(hb + 1) * HALF, :])
        Ovr = os_[hb * HALF:(hb + 1) * HALF, :]
        head = (jnp.zeros((1, 128), jnp.float32) if hb == 0
                else os_[HALF - 1:HALF, :])
        left = act(jnp.concatenate([head, Ovr[:HALF - 1]], axis=0))
        left = jnp.where((rows2k & 127) == 0, 0.0, left)
        Ov = act(Ovr)
        o2 = _mm(left, wk2[0]) + _mm(Ev, wk2[1]) + _mm(Ov, wk2[2]) + bm2[:]
        o2 = jnp.maximum(o2, 0.0)
        o2 = jnp.where((rows2k & 127) < lo[1], o2, 0.0)
        pk[hb * HALF:(hb + 1) * HALF, :] = o2

    # ---- batched window-edge fixes: recompute conv2 rows {0, last2} ---
    # (the only valid conv2 outputs touched by pad taps / x2 padding).
    # Every fix ingredient is a static per-site row of the raw staged
    # tensors: one stride-128 read gathers it for all 32 sites.
    A = jnp.maximum(es[0:GROUP * 128:128, :] + c1b_ref[:] - c0s[:], 0.0)
    B = act(os_[0:GROUP * 128:128, :])
    r0 = jnp.maximum(_mm(A, wk2[1]) + _mm(B, wk2[2]) + bm2[:], 0.0)
    if a_last % 4 == 0:      # K1=11: o2[98] = W0*O[97] + W1*E_c[98]
        La = act(os_[97:GROUP * 128:128, :])
        Lb = jnp.maximum(es[98:GROUP * 128:128, :] + c1b_ref[:] - cNs[:],
                         0.0)
        rL = jnp.maximum(_mm(La, wk2[0]) + _mm(Lb, wk2[1]) + bm2[:], 0.0)
    else:                    # K1=13: o2[97] = W0*O[96] + W1*E[97] + W2*O_c[97]
        La = act(os_[96:GROUP * 128:128, :])
        Lbm = act(es[97:GROUP * 128:128, :])
        Lc = jnp.maximum(os_[97:GROUP * 128:128, :] + c1b_ref[:] - cNs[:],
                         0.0)
        rL = jnp.maximum(_mm(La, wk2[0]) + _mm(Lbm, wk2[1])
                         + _mm(Lc, wk2[2]) + bm2[:], 0.0)
    fixr[0] = r0
    fixr[1] = rL

    def fix_body(i, _):
        pk[pl.ds(i * 128, 1), :] = fixr[0, pl.ds(i, 1), :]
        pk[pl.ds(i * 128 + last2, 1), :] = fixr[1, pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, GROUP, fix_body, 0)

    if stage == "conv2":                         # profiling ablation
        out_ref[0, :, :] = jnp.zeros((GROUP, 128), jnp.float32)
        return

    # ---- deep layers over all GROUP sites (pk <-> pg ping-pong) -------
    bufs = [pk, pg]
    wks = (wk3, wk4, wk5, wk6, wk7, wk8)
    bms = (bm3, bm4, bm5, bm6, bm7, bm8)
    for li in range(6):
        s_in, s_out = STRIDES[li], STRIDES[li + 1]
        xv = _conv_step(bufs[li % 2], GROUP * s_in, s_in,
                        wks[li], bms[li], lo[li + 2], s_out)
        bufs[(li + 1) % 2][0:GROUP * s_out, :] = xv
    # ---- fc over all GROUP sites (h (2, 64) at rows [2s, 2s+2)) -------
    h0 = pk[0:GROUP * 2:2, :]                    # (GROUP, 128) l = 0
    h1 = pk[1:GROUP * 2:2, :]                    # l = 1
    f = _mm(h0, fcw0_ref[:]) + _mm(h1, fcw1_ref[:]) + fcb1_ref[:]
    f = jnp.maximum(f, 0.0)                      # (GROUP, 256)
    logits = _mm(f, fcw2_ref[:]) + fcb2_ref[:]
    out_ref[0, :, :] = logits


@partial(jax.jit, static_argnames=("interpret", "stage"))
def fused_forward(prep: dict, feats_t: jax.Array, bases: jax.Array,
                  rels: jax.Array, interpret: bool = False,
                  stage: str = "full") -> jax.Array:
    """(ng,) bases + (ng, GROUP) rels -> (ng*GROUP, 128) f32 logit rows
    (cols 0:2 are the DNAModNet logits; the rest are zero-weight lanes)."""
    ng = bases.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 25,
        out_specs=pl.BlockSpec((1, GROUP, 128), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, BLOCK_LANES), feats_t.dtype),    # blk
            pltpu.VMEM((BLOCK_LANES, 128), jnp.float32),       # t1 (raw)
            pltpu.VMEM((4, BLOCK_LANES // 4, 128), jnp.float32),  # pbank
            pltpu.VMEM((GROUP * 128, 128), jnp.float32),       # es
            pltpu.VMEM((GROUP * 128, 128), jnp.float32),       # os_
            pltpu.VMEM((GROUP, 128), jnp.float32),             # c0s
            pltpu.VMEM((GROUP, 128), jnp.float32),             # cNs
            pltpu.VMEM((2, GROUP, 128), jnp.float32),          # fixr
            pltpu.VMEM((GROUP * STRIDES[0], 128), jnp.float32),  # pk
            pltpu.VMEM((GROUP * STRIDES[0] // 2, 128),
                       jnp.float32),                           # pg
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),                     # staging
        ],
    )
    weights = [prep["w1m"], prep["c1bias"], prep["w1tap0"], prep["w1tapN"],
               prep["corr0c"], prep["corrNc"]]
    for wk, bm in zip(prep["wm"], prep["bm"]):
        weights += [wk, bm]
    weights += [prep["fcw0"], prep["fcw1"], prep["fcb1"],
                prep["fcw2"], prep["fcb2"]]
    out = pl.pallas_call(
        partial(_fused_kernel, stage=stage),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, GROUP, 128), jnp.float32),
        interpret=interpret,
    )(bases.astype(jnp.int32), rels.astype(jnp.int32), feats_t, *weights)
    return out.reshape(ng * GROUP, 128)


@partial(jax.jit, static_argnames=("interpret",))
def call_sites_fused(prep: dict, feats_t: jax.Array, bases: jax.Array,
                     rels: jax.Array, interpret: bool = False) -> jax.Array:
    """Chunked dispatch wrapper matching call_sites_pallas's interface:
    bases (nb, NG) / rels (nb, NG, GROUP) -> u8 probs (nb*NG*GROUP,)."""
    from ..model.cnn import logits_to_scaled_probs

    def one(batch):
        b, r = batch
        rows = fused_forward(prep, feats_t, b, r, interpret=interpret)
        return logits_to_scaled_probs(rows[:, :2])

    probs = jax.lax.map(one, (bases, rels))
    return probs.reshape(-1)
