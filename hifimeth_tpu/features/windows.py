"""On-device feature pipeline: packed read planes -> per-site windows -> CNN.

TPU-first design, not a translation of the reference's per-site scalar loop
(eval_kmer_features.cpp:9-65).  Reads are packed host-side into a flat u8
buffer of 5 planes (2-bit codes, fi, fp, ri, rp - all in native-forward
coordinates, see features/read_decode.py).  On device:

 1. `featurize_planes` expands the buffer once into an (N, 8) float table
    (one-hot + codeV1-normalized kinetics) - O(bases), amortized over the
    ~100x overlapping windows that share each base.
 2. `gather_windows` turns (center, strand, read-bounds) site descriptors
    into (B, 401, 8) tiles with one big gather; reverse-strand sites reuse
    the same rows via index arithmetic + channel permutation (complementing
    a one-hot is reversing its 4 channels; opposite-strand kinetics is a
    channel swap).  This avoids shipping 401x-redundant feature tensors over
    PCIe and avoids a second reverse-complement feature table in HBM.
 3. the per-context CNN (model/cnn.py) runs on the gathered tiles.

Everything is shape-static and jit-compiled once per (buffer capacity, batch
size).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import KMER_SIZE
from ..model.cnn import dnamodnet_apply, logits_to_scaled_probs

# channel permutation applied to reverse-strand windows:
# one-hot A,C,G,T -> T,G,C,A (complement) ; (fi,fp,ri,rp) -> (ri,rp,fi,fp)
REV_CHANNEL_PERM = np.array([3, 2, 1, 0, 6, 7, 4, 5], dtype=np.int32)


def _codev1_norm(kin_u8: jax.Array) -> jax.Array:
    """codeV1 byte -> frame/952 f32 kinetics normalization.

    On TPU the 256-entry vector gather lowers poorly (~160 ms per 4 Mi-
    position table build, measured scripts/microbench_featurize.py) - but
    the codeV1 decode is 4 piecewise-linear integer segments
    (bam_info.cpp:562-570), so it is computable with 3 selects + a divide
    at ~no cost.  XLA rewrites the divide-by-constant into a reciprocal
    multiply, leaving ~1/3 of the 256 code values 1 ulp away from the
    host-side CODEV1_TO_FRAME_NORM table, so the arithmetic form is used
    only off-CPU where the +/-1-u8 scaled-prob contract
    (mod_batch.cpp:46-64) absorbs it; the CPU backend (tests, interpret-
    mode parity) keeps the table gather, which is cheap there and
    bit-identical to the host golden extractor.  The branch resolves at
    trace time, so on any single backend every device path shares one
    implementation and device paths stay mutually bit-identical.
    """
    if jax.default_backend() == "cpu":
        from ..constants import CODEV1_TO_FRAME_NORM
        return jnp.asarray(CODEV1_TO_FRAME_NORM)[kin_u8]
    c = kin_u8.astype(jnp.float32)
    v = jnp.where(c < 64, c,
                  jnp.where(c < 128, 2.0 * c - 64.0,
                            jnp.where(c < 192, 4.0 * c - 320.0,
                                      8.0 * c - 1088.0)))
    return v / 952.0


@partial(jax.jit, static_argnames=("out_channels",))
def featurize_planes(planes: jax.Array, out_channels: int = 8) -> jax.Array:
    """(5, N) u8 packed planes -> (N, out_channels) float32 feature table.

    out_channels > 8 zero-pads the trailing channels: TPU dynamic-slice
    fetch bandwidth scales with how much of the 128-lane row each slice
    uses, so a wider (zero-padded) table makes the per-site window fetch
    proportionally faster at the cost of table memory; conv1 weights are
    zero-padded to match (engine), keeping results bit-identical."""
    codes = planes[0]
    onehot = (codes[:, None] == jnp.arange(4, dtype=codes.dtype)).astype(jnp.float32)
    kin = _codev1_norm(planes[1:5])                # (4, N) f32
    out = jnp.concatenate([onehot, kin.T], axis=1)
    if out_channels > 8:
        out = jnp.pad(out, ((0, 0), (0, out_channels - 8)))
    return out


@partial(jax.jit, static_argnames=("kmer_size",))
def gather_windows(feats: jax.Array, centers: jax.Array, strands: jax.Array,
                   rstart: jax.Array, rend: jax.Array,
                   kmer_size: int = KMER_SIZE) -> jax.Array:
    """Gather (B, kmer, 8) float32 site windows from the per-base table.

    centers: global fwd-coord center index per site; strands: 0=FWD,1=REV;
    rstart/rend: the owning read's [start, end) span in the packed buffer
    (windows never cross read boundaries; outside positions are zeroed,
    matching the reference's zero padding, eval_kmer_features.cpp:40).
    """
    hk = kmer_size // 2
    j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
    dirs = jnp.where(strands == 0, 1, -1).astype(jnp.int32)
    pos = centers[:, None].astype(jnp.int32) + dirs[:, None] * j[None, :]
    valid = (pos >= rstart[:, None]) & (pos < rend[:, None])
    p = jnp.clip(pos, 0, feats.shape[0] - 1)
    w = feats[p]                                   # (B, kmer, 8)
    w_rev = w[..., jnp.asarray(REV_CHANNEL_PERM)]
    w = jnp.where((strands != 0)[:, None, None], w_rev, w)
    return w * valid[..., None].astype(w.dtype)


@partial(jax.jit, static_argnames=("kmer_size",))
def gather_windows_slice(feats: jax.Array, centers: jax.Array,
                         strands: jax.Array, rstart: jax.Array,
                         rend: jax.Array,
                         kmer_size: int = KMER_SIZE) -> jax.Array:
    """Contiguous-slice window gather: (B, kmer, 8) via batched dynamic_slice.

    A site's window is kmer CONSECUTIVE rows of the per-base feature table,
    so one 12.8 KB contiguous copy per site replaces a row-gather of
    B*kmer 32-byte rows (which TPU XLA lowers to scalar-unit gathers).
    Reverse-strand windows are the flipped ascending slice with the
    complement/swap channel permutation - no descending indexing needed.

    Caller contract: centers-hk and centers+hk must be in-bounds of `feats`
    (the engine packs reads with a kmer-sized zero margin); out-of-read
    positions are zeroed via rstart/rend masking as in gather_windows.
    """
    hk = kmer_size // 2
    starts = (centers - hk).astype(jnp.int32)

    def slice_one(st):
        return jax.lax.dynamic_slice(feats, (st, 0), (kmer_size, feats.shape[1]))

    w = jax.vmap(slice_one)(starts)                  # (B, kmer, C) ascending
    j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
    pos = centers[:, None].astype(jnp.int32) + j[None, :]
    valid = (pos >= rstart[:, None]) & (pos < rend[:, None])
    w = w * valid[..., None].astype(w.dtype)
    C = w.shape[-1]
    perm = np.concatenate([REV_CHANNEL_PERM, np.arange(8, C, dtype=np.int32)])
    w_rev = jnp.flip(w, axis=1)[..., jnp.asarray(perm)]
    return jnp.where((strands != 0)[:, None, None], w_rev, w)


@partial(jax.jit, static_argnames=("fold",))
def featurize_planes_folded(planes: jax.Array, fold: int = 16) -> jax.Array:
    """(5, N) u8 packed planes -> (N/fold, fold*8) position-major folded
    feature table for gather_windows_folded.  N must be a fold multiple
    (engine buffer capacities are powers of two)."""
    feats = featurize_planes(planes)
    return feats.reshape(feats.shape[0] // fold, fold * feats.shape[1])


@jax.jit
def featurize_planes_t(planes: jax.Array) -> jax.Array:
    """(5, N) u8 packed planes -> (8, N) float32 TRANSPOSED feature table.

    Channel-major layout for the Pallas group-fetch kernel
    (ops/gather.group_windows_t): the minor dim is the position axis, so
    blocks of the table and the extracted windows are exactly 128-lane
    tiled with no padding at the XLA<->Pallas boundary.  The table stays
    f32 even in bf16 mode: an (8, N) bf16 array tiles as (16, 128) with 8
    padded sublanes, so a bf16 table would cost the same HBM bytes - the
    kernel instead casts to bf16 at its output write."""
    codes = planes[0]
    onehot = (codes[None, :] == jnp.arange(4, dtype=codes.dtype)[:, None])
    kin = _codev1_norm(planes[1:5])                # (4, N) f32
    return jnp.concatenate([onehot.astype(jnp.float32), kin], axis=0)


@partial(jax.jit, static_argnames=("cap",))
def featurize_planes_t_seg(segments: tuple, cap: int) -> jax.Array:
    """Segmented variant of featurize_planes_t: `segments` is a tuple of
    (5, SEG) u8 plane pieces covering a prefix of the packed buffer, shipped
    to the device incrementally while the host was still decoding reads
    (each jnp.asarray H2D is async, so the 20 MB/flush transfer overlaps
    host work instead of serializing in front of the flush's compute).
    The unshipped tail is materialized as zero features - exactly what the
    packer's 255/0 fill featurizes to - so the result is bit-identical to
    featurize_planes_t over the full (5, cap) buffer."""
    x = jnp.concatenate(segments, axis=1)
    feats = featurize_planes_t(x)
    pad = cap - feats.shape[1]
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad)))
    return feats


@partial(jax.jit, static_argnames=("kmer_size", "fold"))
def gather_windows_folded(folded: jax.Array, centers: jax.Array,
                          strands: jax.Array, rstart: jax.Array,
                          rend: jax.Array, kmer_size: int = KMER_SIZE,
                          fold: int = 16) -> jax.Array:
    """Folded-table window gather: (N/fold, fold*8) f32 -> (B, kmer, 8).

    The per-base feature table is position-major folded so each 128-lane row
    holds `fold` consecutive positions; one window fetch becomes
    ceil((kmer+fold-1)/fold) full-width rows (26 for kmer=401, fold=16)
    instead of kmer narrow 8-lane rows - TPU dynamic-slice fetch cost scales
    with row count, not bytes, so this cuts the dominant window-fetch time
    ~15x.  The sub-row phase (start mod fold) is fixed afterwards with a
    log2(fold)-level static-shift select tree, which XLA fuses into a single
    elementwise pass.  Bit-identical to gather_windows_slice.

    Caller contract: `folded` is featurize_planes(...).reshape(N//fold, -1)
    with N % fold == 0 and the engine's kmer-sized zero margins.
    """
    hk = kmer_size // 2
    C = folded.shape[1] // fold
    frows = (kmer_size + fold - 1 + (fold - 1)) // fold
    start = (centers - hk).astype(jnp.int32)
    r0 = jnp.clip(start // fold, 0, folded.shape[0] - frows)
    d = start - r0 * fold                       # phase in [0, fold)

    def slice_one(r):
        return jax.lax.dynamic_slice(folded, (r, 0), (frows, folded.shape[1]))

    w = jax.vmap(slice_one)(r0)                  # (B, frows, fold*C)
    B = w.shape[0]
    w = w.reshape(B, frows * fold, C)
    bit = fold >> 1
    while bit:
        keep = w.shape[1] - bit
        w = jnp.where(((d & bit) > 0)[:, None, None], w[:, bit:bit + keep],
                      w[:, :keep])
        bit >>= 1
    w = w[:, :kmer_size]
    j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
    pos = centers[:, None].astype(jnp.int32) + j[None, :]
    valid = (pos >= rstart[:, None]) & (pos < rend[:, None])
    w = w * valid[..., None].astype(w.dtype)
    w_rev = jnp.flip(w, axis=1)[..., jnp.asarray(REV_CHANNEL_PERM)]
    return jnp.where((strands != 0)[:, None, None], w_rev, w)


@partial(jax.jit, static_argnames=("kmer_size",))
def gather_and_featurize(planes_t: jax.Array, centers: jax.Array,
                         strands: jax.Array, rstart: jax.Array,
                         rend: jax.Array,
                         kmer_size: int = KMER_SIZE) -> jax.Array:
    """u8-gather variant: (N, 5) transposed packed planes -> (B, kmer, 8).

    Gathers raw u8 plane bytes (5 B/position instead of 32 B from the f32
    table) and featurizes per window - 6.4x less HBM gather traffic, no
    (N, 8) table in memory.  Used by the training data pipeline and as an
    alternative inference path.
    """
    hk = kmer_size // 2
    j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
    dirs = jnp.where(strands == 0, 1, -1).astype(jnp.int32)
    pos = centers[:, None].astype(jnp.int32) + dirs[:, None] * j[None, :]
    valid = (pos >= rstart[:, None]) & (pos < rend[:, None])
    p = jnp.clip(pos, 0, planes_t.shape[0] - 1)
    w = planes_t[p]                                # (B, kmer, 5) u8
    codes = w[..., 0]
    is_rev = (strands != 0)[:, None]
    codes = jnp.where(is_rev & (codes < 4), 3 - codes, codes)
    onehot = (codes[..., None] == jnp.arange(4, dtype=codes.dtype)).astype(jnp.float32)
    kin = _codev1_norm(w[..., 1:5])                # (B, kmer, 4) f32
    kin_rev = kin[..., jnp.asarray([2, 3, 0, 1])]
    kin = jnp.where(is_rev[..., None], kin_rev, kin)
    out = jnp.concatenate([onehot, kin], axis=-1)
    return out * valid[..., None].astype(out.dtype)


@partial(jax.jit, static_argnames=("rev", "kmer_size", "compute_dtype",
                                   "spec", "conv_impl", "group",
                                   "block_lanes", "interpret"))
def call_sites_pallas(params, feats_t: jax.Array, bases: jax.Array,
                      rels: jax.Array, rev: bool = False,
                      kmer_size: int = KMER_SIZE,
                      compute_dtype=jnp.float32, spec: tuple | None = None,
                      conv_impl: str = "direct", group: int = 32,
                      block_lanes: int = 2048,
                      interpret: bool = False) -> jax.Array:
    """Pallas group-fetch call path: one HBM block DMA per `group`
    position-sorted sites (ops/gather.group_windows_t) instead of one XLA
    dynamic-slice per site, whose ~1.4 us fixed cost dominates the pipeline
    (25 ms fetch vs 5 ms CNN per 16384-site batch on v5e).

    No per-site read-bounds masking: the engine packs reads with a
    >= kmer//2 zero-feature gap (seq plane 255 + zero kinetics featurize to
    exactly 0.0), so window lanes beyond a read's edge read zeros from the
    table - bit-identical to the reference's window zero-padding
    (eval_kmer_features.cpp:40) without shipping per-site
    (center, rstart, rend) arrays to the device or running a (B, 8, kmer)
    mask multiply over the gather output.

    Strand handling is STATIC: the engine routes forward and reverse sites
    into separate dispatches (rev=False / rev=True programs).  The reverse
    program applies the window flip + channel permutation unconditionally,
    which XLA fuses into the NCW->NWC relayout feeding conv1 - measured
    ~40% cheaper per batch than the old per-site
    flip+permute+jnp.where select over the full window tensor, and no
    per-site strand array ships to the device at all.

    bases (nb, NG) 128-aligned block bases; rels (nb, NG, group) window-start
    lanes relative to base.  Returns u8 probs (nb * NG * group,) in slot
    order.
    """
    from ..ops.gather import group_windows_t

    def one(batch):
        b, r = batch
        # windows come out of the kernel already in compute_dtype: in bf16
        # mode that halves the flip/transpose traffic over the largest
        # tensor of the gather stage (bit-identical no-op for f32)
        wt = group_windows_t(feats_t, b, r, group=group,
                             block_lanes=block_lanes,
                             interpret=interpret,
                             out_dtype=compute_dtype)    # (SB, 8, OUT_LANES)
        wt = wt[:, :, :kmer_size]
        if rev:
            # reverse-strand window = flipped lanes + complement/swap channel
            # permutation (one-hot complement = channel reversal)
            wt = jnp.flip(wt, axis=2)[:, jnp.asarray(REV_CHANNEL_PERM), :]
        # NCW -> NWC; XLA fuses the transpose (and the static flip/perm)
        # into conv1's input handling
        w = wt.transpose(0, 2, 1)
        logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype,
                                 spec=spec, conv_impl=conv_impl)
        return logits_to_scaled_probs(logits)

    probs = jax.lax.map(one, (bases, rels))
    return probs.reshape(-1)


@partial(jax.jit, static_argnames=("mesh", "rev", "kmer_size",
                                   "compute_dtype", "spec", "conv_impl",
                                   "group", "block_lanes", "interpret"))
def call_sites_pallas_dp(params, feats_t: jax.Array, bases: jax.Array,
                         rels: jax.Array, rev: bool = False,
                         *, mesh, kmer_size: int = KMER_SIZE,
                         compute_dtype=jnp.float32, spec: tuple | None = None,
                         conv_impl: str = "direct", group: int = 32,
                         block_lanes: int = 2048,
                         interpret: bool = False) -> jax.Array:
    """Data-parallel group-fetch call: shard the group axis over the mesh's
    `data` axis and run the SAME single-chip pallas program per device
    (shard_map) - the TPU-native analog of the reference's read-level
    thread pool (mod_main.cpp:330-350), scaling the fast kernel instead of
    downgrading to the slice gather.  Params and the feature table are
    replicated; sites are embarrassingly parallel, so no collectives run in
    the hot loop.  check_vma=False: pallas_call's out_shape carries no vma,
    which trips shard_map's varying-mesh-axes checker; the body is manifestly
    per-shard (no collectives), so the check adds nothing here.

    bases (nb, NGT) / rels (nb, NGT, group), where NGT = n_data *
    groups-per-device; group axes shard into per-device contiguous blocks.
    `rev` statically selects the reverse-strand program, exactly as in the
    single-device path.  Returns u8 probs (nb * NGT * group,) in the same
    slot order as the single-device path.
    """
    from jax.sharding import PartitionSpec as P

    statics = dict(rev=rev, kmer_size=kmer_size, compute_dtype=compute_dtype,
                   spec=spec, conv_impl=conv_impl, group=group,
                   block_lanes=block_lanes, interpret=interpret)

    def local(p, ft, b, r):
        return call_sites_pallas(p, ft, b, r,
                                 **statics).reshape(b.shape[0], -1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, "data"), P(None, "data", None)),
        out_specs=P(None, "data"), check_vma=False)
    return fn(params, feats_t, bases, rels).reshape(-1)


@partial(jax.jit, static_argnames=("kmer_size", "compute_dtype", "spec",
                                   "conv_impl"))
def call_sites_grid(params, feats: jax.Array, centers: jax.Array,
                    strands: jax.Array, rstart: jax.Array, rend: jax.Array,
                    kmer_size: int = KMER_SIZE, compute_dtype=jnp.float32,
                    spec: tuple | None = None,
                    conv_impl: str = "direct") -> jax.Array:
    """2D-batched variant: inputs (nb, site_batch), sharded on the second
    axis for multi-chip data parallelism (each lax.map step runs SPMD over
    the mesh's data axis; feats/params replicated)."""
    def one(batch):
        c, s, rs, re = batch
        w = gather_windows_slice(feats, c, s, rs, re, kmer_size)
        w = jax.lax.optimization_barrier(w)
        logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype,
                                 spec=spec, conv_impl=conv_impl)
        return logits_to_scaled_probs(logits)

    return jax.lax.map(one, (centers, strands, rstart, rend))


@partial(jax.jit, static_argnames=("kmer_size", "compute_dtype", "spec"))
def call_sites(params, feats: jax.Array, centers: jax.Array,
               strands: jax.Array, rstart: jax.Array, rend: jax.Array,
               kmer_size: int = KMER_SIZE,
               compute_dtype=jnp.float32,
               spec: tuple | None = None) -> jax.Array:
    """windows -> CNN -> u8 scaled probs, fused under one jit.

    `spec` is the static conv geometry (model.cnn.conv_spec); required when
    the params pytree holds only weight tensors.
    """
    w = gather_windows(feats, centers, strands, rstart, rend, kmer_size)
    logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype, spec=spec)
    return logits_to_scaled_probs(logits)


@partial(jax.jit, static_argnames=("site_batch", "kmer_size", "compute_dtype",
                                   "spec", "conv_impl", "gather_impl"))
def call_sites_batched(params, feats: jax.Array, centers: jax.Array,
                       strands: jax.Array, rstart: jax.Array,
                       rend: jax.Array, site_batch: int,
                       kmer_size: int = KMER_SIZE,
                       compute_dtype=jnp.float32,
                       spec: tuple | None = None,
                       conv_impl: str = "direct",
                       gather_impl: str = "slice") -> jax.Array:
    """All sites of a flush in ONE device dispatch.

    The flat site arrays (length = n_batches * site_batch, host-padded) are
    reshaped to (n_batches, site_batch) and processed with lax.map - a single
    XLA program per flush instead of one dispatch + 4 H2D transfers per
    batch, which matters when device round-trip latency is high (remote TPU
    tunnels, congested PCIe).  VMEM stays bounded by one site_batch of
    windows.

    Uses the contiguous-slice gather (gather_windows_slice), so the engine
    must pack reads with a kmer-sized margin at both buffer ends.
    """
    n = centers.shape[0]
    assert n % site_batch == 0, "host must pad sites to a site_batch multiple"
    nb = n // site_batch
    gather = (gather_windows_folded if gather_impl == "folded"
              else gather_windows_slice)

    def one(batch):
        c, s, rs, re = batch
        w = gather(feats, c, s, rs, re, kmer_size)
        w = jax.lax.optimization_barrier(w)
        logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype,
                                 spec=spec, conv_impl=conv_impl)
        return logits_to_scaled_probs(logits)

    probs = jax.lax.map(one, (centers.reshape(nb, site_batch),
                              strands.reshape(nb, site_batch),
                              rstart.reshape(nb, site_batch),
                              rend.reshape(nb, site_batch)))
    return probs.reshape(n)
