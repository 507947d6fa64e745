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

from ..constants import CODEV1_TO_FRAME_NORM, KMER_SIZE
from ..model.cnn import dnamodnet_apply, logits_to_scaled_probs

# channel permutation applied to reverse-strand windows:
# one-hot A,C,G,T -> T,G,C,A (complement) ; (fi,fp,ri,rp) -> (ri,rp,fi,fp)
REV_CHANNEL_PERM = np.array([3, 2, 1, 0, 6, 7, 4, 5], dtype=np.int32)


@jax.jit
def featurize_planes(planes: jax.Array) -> jax.Array:
    """(5, N) u8 packed planes -> (N, 8) float32 per-base feature table."""
    codes = planes[0]
    onehot = (codes[:, None] == jnp.arange(4, dtype=codes.dtype)).astype(jnp.float32)
    table = jnp.asarray(CODEV1_TO_FRAME_NORM)
    kin = table[planes[1:5]]                       # (4, N) f32
    return jnp.concatenate([onehot, kin.T], axis=1)


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

    w = jax.vmap(slice_one)(starts)                  # (B, kmer, 8) ascending
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
    table = jnp.asarray(CODEV1_TO_FRAME_NORM)
    kin = table[w[..., 1:5]]                       # (B, kmer, 4) f32
    kin_rev = kin[..., jnp.asarray([2, 3, 0, 1])]
    kin = jnp.where(is_rev[..., None], kin_rev, kin)
    out = jnp.concatenate([onehot, kin], axis=-1)
    return out * valid[..., None].astype(out.dtype)


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
                                   "spec", "conv_impl"))
def call_sites_batched(params, feats: jax.Array, centers: jax.Array,
                       strands: jax.Array, rstart: jax.Array,
                       rend: jax.Array, site_batch: int,
                       kmer_size: int = KMER_SIZE,
                       compute_dtype=jnp.float32,
                       spec: tuple | None = None,
                       conv_impl: str = "direct") -> jax.Array:
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

    def one(batch):
        c, s, rs, re = batch
        w = gather_windows_slice(feats, c, s, rs, re, kmer_size)
        w = jax.lax.optimization_barrier(w)
        logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype,
                                 spec=spec, conv_impl=conv_impl)
        return logits_to_scaled_probs(logits)

    probs = jax.lax.map(one, (centers.reshape(nb, site_batch),
                              strands.reshape(nb, site_batch),
                              rstart.reshape(nb, site_batch),
                              rend.reshape(nb, site_batch)))
    return probs.reshape(n)
