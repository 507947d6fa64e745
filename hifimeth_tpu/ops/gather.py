"""Pallas TPU kernels for the per-site window fetch.

XLA lowers the batched per-site dynamic-slice gather of the call pipeline to
a serialized slice loop with a ~1.4 us fixed cost per site - 25 ms per
16384-site batch against 5 ms of CNN on v5e, independent of slice size or
source-tensor size (measured via scripts/microbench_gather.py).  The
production kernel here, `group_windows_t`, removes the per-site slices
entirely: the host sorts sites by position (neighboring candidate sites are
~2.5 bp apart) and packs groups of `group` sites whose windows fit one
block; the kernel streams ONE HBM->VMEM block DMA per group (double
buffered across the grid) and extracts each window with an aligned VMEM
chunk read + dynamic lane rotate.  Measured 2.4 ms per 16384-site batch -
10x the XLA gather - and ~6x less HBM fetch traffic.

Layout rule (learned from Mosaic rejections): at the XLA<->Pallas boundary
arrays get the default (8, 128)-tiled layout with the minor dim padded to
128 lanes, so narrow tables like (N, 8) materialize 16x padded and their
DMA slices are lane-misaligned.  Everything this kernel touches keeps a
>=128 minor dim: the feature table is transposed to (8, N)
(features/windows.featurize_planes_t) and windows are emitted transposed as
(B, 8, OUT_LANES).

`window_rows` / `window_slices` are earlier per-site-DMA kernels kept for
reference (see status note below); `group_windows` is the row-major
predecessor of `group_windows_t` (its (N, 8) operand hits the padded-layout
problem and is kept as documentation of it plus interpret-mode testing).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_rows_kernel(starts_ref, isrev_ref,      # scalar prefetch (SMEM)
                        d_ref, dr_ref,              # (N, C) tables in ANY/HBM
                        out_ref,                    # (SPP, out_rows, C) VMEM
                        scratch, sems,
                        *, spp: int, fetch_rows: int, out_rows: int):
    i = pl.program_id(0)

    def start_dma(t):
        idx = i * spp + t
        st = starts_ref[idx]
        rev = isrev_ref[idx]

        @pl.when(rev == 0)
        def _():
            pltpu.make_async_copy(
                d_ref.at[pl.ds(st, fetch_rows), :], scratch.at[t],
                sems.at[t]).start()

        @pl.when(rev != 0)
        def _():
            pltpu.make_async_copy(
                dr_ref.at[pl.ds(st, fetch_rows), :], scratch.at[t],
                sems.at[t]).start()

    for t in range(spp):
        start_dma(t)
    for t in range(spp):
        idx = i * spp + t
        # wait on the semaphore (the descriptor's source ref is irrelevant
        # for wait; byte count/shape match either table)
        pltpu.make_async_copy(
            d_ref.at[pl.ds(starts_ref[idx], fetch_rows), :], scratch.at[t],
            sems.at[t]).wait()
        rows = scratch[t]                            # (fetch_rows, C)
        phase = rows.reshape(fetch_rows // 2, 2, rows.shape[-1])[:, 0, :]
        # row flip for reverse-strand sites happens in XLA (lax.rev is not
        # lowerable inside Pallas TPU kernels)
        out_ref[t, :, :] = phase[:out_rows]


@partial(jax.jit,
         static_argnames=("fetch_rows", "out_rows", "spp", "interpret"))
def window_rows(d_table: jax.Array, dr_table: jax.Array,
                starts: jax.Array, is_rev: jax.Array,
                fetch_rows: int, out_rows: int, spp: int = 8,
                interpret: bool = False) -> jax.Array:
    """(B,) site starts -> (B, out_rows, C) stride-2 phase rows.

    For each site: fetch fetch_rows consecutive rows of d_table (fwd) or
    dr_table (rev) starting at starts[i], keeping every other row (out_rows
    of them).  Callers flip reverse-strand rows afterwards (cheap in XLA,
    unlowerable in-kernel)."""
    B = starts.shape[0]
    assert B % spp == 0
    C = d_table.shape[1]
    kernel = partial(_window_rows_kernel, spp=spp, fetch_rows=fetch_rows,
                     out_rows=out_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // spp,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((spp, out_rows, C), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((spp, fetch_rows, C), d_table.dtype),
            pltpu.SemaphoreType.DMA((spp,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, out_rows, C), d_table.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), is_rev.astype(jnp.int32), d_table, dr_table)


def _window_slice_kernel(starts_ref, feats_ref, out_ref, scratch, sems,
                         *, spp: int, kmer: int):
    i = pl.program_id(0)
    for t in range(spp):
        st = starts_ref[i * spp + t]
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(st, kmer), :], scratch.at[t], sems.at[t]
        ).start()
    for t in range(spp):
        st = starts_ref[i * spp + t]
        pltpu.make_async_copy(
            feats_ref.at[pl.ds(st, kmer), :], scratch.at[t], sems.at[t]
        ).wait()
        out_ref[t, :, :] = scratch[t]


@partial(jax.jit, static_argnames=("kmer", "spp", "interpret"))
def window_slices(feats: jax.Array, starts: jax.Array, kmer: int,
                  spp: int = 8, interpret: bool = False) -> jax.Array:
    """(B,) starts -> (B, kmer, C) consecutive-row fetches."""
    B = starts.shape[0]
    assert B % spp == 0
    C = feats.shape[1]
    kernel = partial(_window_slice_kernel, spp=spp, kmer=kmer)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // spp,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((spp, kmer, C), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((spp, kmer, C), feats.dtype),
            pltpu.SemaphoreType.DMA((spp,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, kmer, C), feats.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), feats)


# Status note: the two per-site-DMA kernels above are verified in interpret
# mode but run far below expectations compiled (per-DMA issue cost with only
# spp descriptors in flight, plus the XLA<->Pallas boundary materializing the
# narrow (N, 8) table 128-lane padded).  They are kept for reference; the
# production path is group_windows_t below, which fixed both problems.


def _group_windows_kernel(bases_ref, rels_ref,       # scalar prefetch (SMEM)
                          feats_ref,                 # (N, C) table in ANY/HBM
                          out_ref,                   # (G, kmer, C) VMEM block
                          scratch, sems,
                          *, group: int, block_rows: int, kmer: int):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    def block_dma(i, slot):
        return pltpu.make_async_copy(
            feats_ref.at[pl.ds(bases_ref[i], block_rows), :],
            scratch.at[slot], sems.at[slot])

    # double-buffered block prefetch: step g waits on slot g%2, and kicks
    # off the DMA for step g+1 into the other slot before extracting
    @pl.when(g == 0)
    def _():
        block_dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        block_dma(g + 1, (g + 1) % 2).start()

    slot = g % 2
    block_dma(g, slot).wait()
    for t in range(group):
        out_ref[0, t, :, :] = scratch[slot, pl.ds(rels_ref[g, t], kmer), :]


@partial(jax.jit,
         static_argnames=("group", "block_rows", "kmer", "interpret"))
def group_windows(feats: jax.Array, bases: jax.Array, rels: jax.Array,
                  group: int, block_rows: int, kmer: int,
                  interpret: bool = False) -> jax.Array:
    """Group-local window fetch: ONE HBM->VMEM block DMA per `group` sites.

    The host sorts each batch's sites by position and packs them into groups
    whose window span fits in `block_rows` rows (neighboring candidate sites
    are ~2.5 bp apart, so 32 windows typically span ~80 rows); the kernel
    streams one (block_rows, C) block per group and extracts the kmer-row
    windows with VMEM slices.  This replaces XLA's per-site dynamic-slice
    gather, whose ~1.4 us/site fixed cost dominates the call pipeline
    (measured: 25 ms vs 5 ms of CNN per 16384-site batch), and cuts HBM
    fetch traffic ~6x.

    bases: (n_groups,) int32 block base row per group, in [0, N-block_rows];
    rels:  (n_groups, group) int32 per-site window start rows relative to the
           group's base, in [0, block_rows - kmer].
    Returns (n_groups * group, kmer, C) f32 ascending-row windows (mask,
    reverse-strand flip/permute stay in XLA where they fuse with the CNN).
    """
    ng = bases.shape[0]
    C = feats.shape[1]
    kernel = partial(_group_windows_kernel, group=group,
                     block_rows=block_rows, kmer=kmer)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, group, kmer, C),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, C), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, group, kmer, C), feats.dtype),
        interpret=interpret,
    )(bases.astype(jnp.int32), rels.astype(jnp.int32), feats)
    return out.reshape(ng * group, kmer, C)


def plan_groups(starts_sorted: "np.ndarray", group: int, block_rows: int,
                kmer: int, n_rows: int, extent: int | None = None):
    """Host-side grouping for group_windows: pack position-sorted window
    starts into groups of `group` sites whose span fits one block.

    Returns (bases (ng,) int32, rels (ng, group) int32, idx).  idx maps each
    group slot back to its position in starts_sorted; partial groups are
    padded by repeating one of the group's real sites (identical windows ->
    identical probs, so callers can scatter flat results through idx and the
    duplicates overwrite with the same value).  In the common fully-
    vectorized case (every consecutive chunk of `group` sites fits the span
    cap) slot order IS input order - idx is returned as None so the caller
    can skip both the idx allocation and the scatter (take flat[:n]
    directly).  Span violations fall back to a greedy split loop with a
    real idx.
    """
    n = len(starts_sorted)
    cap = block_rows - (kmer if extent is None else extent)
    if n == 0:
        return np.zeros(0, np.int32), np.zeros((0, group), np.int32), None
    ng0 = (n + group - 1) // group
    pad = ng0 * group - n
    padded = np.concatenate(
        [starts_sorted, np.full(pad, starts_sorted[-1], starts_sorted.dtype)])
    chunks = padded.reshape(ng0, group)
    if (chunks[:, -1] - chunks[:, 0] <= cap).all():
        bases = np.minimum(chunks[:, 0], n_rows - block_rows).astype(np.int32)
        return bases, (chunks - bases[:, None]).astype(np.int32), None
    # greedy split: some group's span exceeds the cap
    bases, rels, idx = [], [], []
    i = 0
    while i < n:
        j = min(i + group, n)
        if starts_sorted[j - 1] - starts_sorted[i] > cap:
            j = i + int(np.searchsorted(starts_sorted[i:j],
                                        starts_sorted[i] + cap, side="right"))
            j = max(j, i + 1)
        s = starts_sorted[i:j]
        s = np.concatenate([s, np.full(group - len(s), s[0], s.dtype)])
        k = np.concatenate([np.arange(i, j, dtype=np.int64),
                            np.full(group - (j - i), i, np.int64)])
        base = min(int(s.min()), n_rows - block_rows)
        bases.append(base)
        rels.append(s - base)
        idx.append(k)
        i = j
    return (np.asarray(bases, np.int32), np.asarray(rels, np.int32),
            np.asarray(idx, np.int64))


# --- transposed-layout group fetch (the production kernel) -----------------
#
# Layout rule learned the hard way: at the XLA<->Pallas boundary, arrays are
# laid out in (8, 128) tiles with the minor dim padded to 128 lanes, so a
# narrow (N, 8) feature table materializes 16x padded and DMA slices of it
# are lane-misaligned.  The transposed table (8, N) and transposed window
# blocks (G, 8, 512) are exactly lane-tiled with no padding waste.

OUT_LANES = 512          # window container: kmer 401 + roll slack, 4 tiles
CHUNK_LANES = 640        # aligned per-site chunk: 127 max phase + 401 + pad


def _group_windows_t_kernel(bases_ref, rels_ref,     # scalar prefetch (SMEM)
                            feats_ref,               # (8, N) table ANY/HBM
                            out_ref,                 # (1, G, 8, 512) VMEM
                            scratch, sems,
                            *, group: int, block_lanes: int, out_dtype):
    g = pl.program_id(0)
    ng = pl.num_programs(0)

    def block_dma(i, slot):
        base = pl.multiple_of(bases_ref[i], 128)
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(base, block_lanes)],
            scratch.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        block_dma(0, 0).start()

    @pl.when(g + 1 < ng)
    def _():
        block_dma(g + 1, (g + 1) % 2).start()

    slot = g % 2
    block_dma(g, slot).wait()
    for t in range(group):
        rel = rels_ref[g, t]
        off = pl.multiple_of((rel // 128) * 128, 128)
        p = rel - off                                # phase in [0, 128)
        chunk = scratch[slot, :, pl.ds(off, CHUNK_LANES)]    # (8, 640)
        # left-rotate by p: window lanes land at [0, kmer)
        rolled = pltpu.roll(chunk, CHUNK_LANES - p, axis=1)
        # cast at the VMEM write: in bf16 mode this halves the kernel's
        # output traffic AND every downstream elementwise/transpose pass
        out_ref[0, t, :, :] = rolled[:, :OUT_LANES].astype(out_dtype)


@partial(jax.jit, static_argnames=("group", "block_lanes", "interpret",
                                   "out_dtype"))
def group_windows_t(feats_t: jax.Array, bases: jax.Array, rels: jax.Array,
                    group: int = 32, block_lanes: int = 2048,
                    interpret: bool = False,
                    out_dtype=None) -> jax.Array:
    """Group-local window fetch, transposed layout: ONE HBM->VMEM DMA per
    `group` position-sorted sites, per-site extraction via aligned chunk +
    dynamic lane rotate.  Returns (ng*group, 8, OUT_LANES) windows with
    the kmer rows at lanes [0, kmer); lanes beyond kmer are rotation garbage
    for the caller to mask/slice.

    feats_t: (8, N) transposed feature table (featurize_planes_t).
    bases:   (ng,) int32, 128-aligned block base lane, in [0, N-block_lanes].
    rels:    (ng, group) int32 window-start lane minus base, in
             [0, block_lanes - CHUNK_LANES].
    out_dtype: window dtype (default: table dtype).  bfloat16 halves the
    kernel's output write traffic and every downstream pass over the windows
    (the (B, 8, 512) block is by far the largest tensor of the gather stage).
    """
    ng = bases.shape[0]
    out_dtype = feats_t.dtype if out_dtype is None else out_dtype
    kernel = partial(_group_windows_t_kernel, group=group,
                     block_lanes=block_lanes, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, group, 8, OUT_LANES),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, block_lanes), feats_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, group, 8, OUT_LANES),
                                       out_dtype),
        interpret=interpret,
    )(bases.astype(jnp.int32), rels.astype(jnp.int32), feats_t)
    return out.reshape(ng * group, 8, OUT_LANES)
