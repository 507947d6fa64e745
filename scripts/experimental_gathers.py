"""Retired experimental gather/call paths, kept out of the production engine.

These were alternative window-fetch strategies benchmarked in round 1
(docs/BENCHMARKS.md "paths that regressed" records the numbers).  All lose to
the production Pallas group-fetch path (`ops/gather.group_windows_t`) on TPU
and to the folded-table gather on the CPU backend, so the engine no longer
dispatches them; they are preserved here with their parity tests
(tests/test_experimental_gathers.py) as documentation of the design space:

 - gather_windows_slice_u8: contiguous u8 slice fetch (5 B/position instead
   of 32 B) + per-window featurize.  Less HBM traffic but still pays XLA's
   ~1.4 us fixed cost per dynamic slice.
 - call_sites_blocked: host span-caps sorted site batches so one big
   contiguous block slice covers every window, windows then slice the block.
   The VMEM-scale block slice defeats XLA's fusion and loses to the Pallas
   kernel's explicit double-buffered DMA.
 - dense_conv1_tables / call_sites_dense: stride-1 "a trous" first conv over
   the whole packed buffer; per-window conv1 outputs are stride-2 slices of
   it with edge-tap corrections.  Exact, and removes conv1 FLOPs from the
   per-site path, but the full-buffer dense tables CRASH the TPU worker
   through the axon tunnel (CLAUDE.md) and the slice-extraction cost
   dominates anyway.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hifimeth_tpu.constants import CODEV1_TO_FRAME_NORM, KMER_SIZE
from hifimeth_tpu.features.windows import REV_CHANNEL_PERM
from hifimeth_tpu.model.cnn import dnamodnet_apply, logits_to_scaled_probs


@partial(jax.jit, static_argnames=("kmer_size",))
def gather_windows_slice_u8(planes_t: jax.Array, centers: jax.Array,
                            strands: jax.Array, rstart: jax.Array,
                            rend: jax.Array,
                            kmer_size: int = KMER_SIZE) -> jax.Array:
    """Contiguous u8 slice gather: (N, 5) transposed planes -> (B, kmer, 8).

    Fetches 5 B/position instead of the 32 B/position of the f32-table slice
    (6.4x less fetch traffic) and featurizes per window (one-hot + codeV1
    table on the small batch).  Same results as gather_windows_slice."""
    hk = kmer_size // 2
    starts = (centers - hk).astype(jnp.int32)

    def slice_one(st):
        return jax.lax.dynamic_slice(planes_t, (st, 0),
                                     (kmer_size, planes_t.shape[1]))

    w = jax.vmap(slice_one)(starts)                  # (B, kmer, 5) ascending
    j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
    pos = centers[:, None].astype(jnp.int32) + j[None, :]
    valid = (pos >= rstart[:, None]) & (pos < rend[:, None])

    codes = w[..., 0]
    onehot = (codes[..., None] == jnp.arange(4, dtype=codes.dtype)).astype(jnp.float32)
    table = jnp.asarray(CODEV1_TO_FRAME_NORM)
    kin = table[w[..., 1:5]]
    out = jnp.concatenate([onehot, kin], axis=-1)
    out = out * valid[..., None].astype(out.dtype)
    out_rev = jnp.flip(out, axis=1)[..., jnp.asarray(REV_CHANNEL_PERM)]
    return jnp.where((strands != 0)[:, None, None], out_rev, out)


def dense_conv1_tables(fwd_table: jax.Array, w1: jax.Array, lo: int,
                       rev_table: jax.Array):
    """Stride-1 first-conv tables over the whole packed buffer (a trous).

    Candidate-site windows overlap ~100x, so computing conv1 once per
    position instead of once per window slot removes the dominant FLOP cost
    (including the 16x MXU channel-padding waste of Cin=8) from the per-site
    path - exactly, not approximately: per-window stride-2 conv outputs are
    stride-2 slices of the stride-1 dense output, with only the two
    window-edge taps needing correction (handled in call_sites_dense).

    Returns (D, Dr):
      D[u]  = sum_k w1[k] . fwd_table[u - lo + k]      (forward windows)
      Dr[u] = sum_k w1[k] . rev_table[u - k]           (reverse windows;
              rev_table is the bn0'd channel-permuted feature table)
    """
    K = w1.shape[0]
    x = fwd_table[None]                                 # (1, N, 8)
    D = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1,), padding=[(lo, K - 1 - lo)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)[0]
    xp = rev_table[None]
    w_rev = jnp.flip(w1, axis=0)
    Dr = jax.lax.conv_general_dilated(
        xp, w_rev, window_strides=(1,), padding=[(K - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)[0]
    return D, Dr


@partial(jax.jit, static_argnames=("site_batch", "kmer_size", "compute_dtype",
                                   "spec", "conv_impl"))
def call_sites_dense(params, feats: jax.Array, centers: jax.Array,
                     strands: jax.Array, rstart: jax.Array, rend: jax.Array,
                     site_batch: int, kmer_size: int = KMER_SIZE,
                     compute_dtype=jnp.float32, spec: tuple | None = None,
                     conv_impl: str = "direct") -> jax.Array:
    """One-dispatch flush call with a densified first conv layer.

    EXACT equivalent of the windowed pipeline (verified in
    tests/test_experimental_gathers.py): per-site layer-1 outputs are
    stride-2 slices of the dense tables with (a) masking of rows whose tap
    range lies fully outside the read, and (b) single-tap corrections at the
    two window-boundary outputs where the window's conv padding differs from
    the dense neighborhood.

    Engine contract: reads are packed with >= K-1 zero-feature positions
    between them (seq-plane gap code 255 -> all-zero features), so dense
    taps never leak across reads.
    """
    w1 = params["convs"][0]["w"]
    b1 = params["convs"][0]["b"]
    K = w1.shape[0]
    stride, lo, hi = spec[0]
    hk = kmer_size // 2
    Lo1 = (kmer_size + lo + hi - K) // stride + 1
    perm = jnp.asarray(REV_CHANNEL_PERM)

    # bn0 folds into the tables; gap/margin positions featurize to zero so
    # they carry bn0(0) = shift - exactly the windowed model's value for
    # out-of-read window slots (mask zeros features BEFORE bn0).  For the
    # reverse strand bn0 must be applied after the channel permutation.
    scale = jnp.asarray(params["bn0"]["scale"])
    shift = jnp.asarray(params["bn0"]["shift"])
    Fb = feats * scale + shift
    Gb = feats[:, perm] * scale + shift
    D, Dr = dense_conv1_tables(Fb, w1, lo, Gb)
    # rows whose whole tap range is out-of-read equal conv(shift-constant)
    kappa = shift @ jnp.sum(w1, axis=0)                 # (C,)

    n = centers.shape[0]
    nb = n // site_batch

    def one(batch):
        c, s, rs, re = batch
        c = c.astype(jnp.int32)
        is_rev = (s != 0)

        # fwd rows: u_j = c - hk + 2j ; rev rows: v_j = c + hk + 1 - 2j
        start_f = c - hk
        start_r = c + hk + 1 - 2 * (Lo1 - 1)
        start = jnp.where(is_rev, start_r, start_f)

        def slice_rows(tab, st):
            return jax.lax.dynamic_slice(tab, (st, 0), (2 * Lo1, tab.shape[1]))

        rows_f = jax.vmap(lambda st: slice_rows(D, st))(start)
        rows_r = jax.vmap(lambda st: slice_rows(Dr, st))(start)
        rows = jnp.where(is_rev[:, None, None], rows_r, rows_f)
        pre = rows.reshape(-1, Lo1, 2, rows.shape[-1])[:, :, 0, :]
        # rev slices are ascending in v = descending in j -> flip
        pre = jnp.where(is_rev[:, None, None], jnp.flip(pre, axis=1), pre)

        # validity: fwd keeps u in [rs - K + 2, re]; rev keeps v in
        # [rs, re + K - 2].  Rows whose tap range misses the read entirely
        # equal conv over all-shift window slots = kappa.
        j = jnp.arange(Lo1, dtype=jnp.int32)
        u = c[:, None] - hk + 2 * j[None, :]
        v = c[:, None] + hk + 1 - 2 * j[None, :]
        valid_f = (u >= rs[:, None] - (K - 2)) & (u <= re[:, None])
        valid_r = (v >= rs[:, None]) & (v <= re[:, None] + K - 2)
        valid = jnp.where(is_rev[:, None], valid_r, valid_f)
        pre = jnp.where(valid[..., None], pre, kappa)

        # edge corrections: the first/last output's out-of-window tap is the
        # conv PAD (a literal zero, applied after bn0) in the windowed model,
        # but dense computed it from the neighboring table row (valid rows)
        # or it is baked into kappa as a shift tap (invalid rows) - subtract
        # whichever was added.
        f_lo = Fb[jnp.clip(c - hk - 1, 0, Fb.shape[0] - 1)]   # (B, 8)
        f_hi = Fb[jnp.clip(c + hk + 1, 0, Fb.shape[0] - 1)]
        g_lo = Gb[jnp.clip(c - hk - 1, 0, Gb.shape[0] - 1)]
        g_hi = Gb[jnp.clip(c + hk + 1, 0, Gb.shape[0] - 1)]
        w_first = w1[0]                                  # (8, C)
        w_last = w1[K - 1]
        shift_first = shift @ w_first
        shift_last = shift @ w_last
        fix0 = jnp.where(is_rev[:, None], g_hi @ w_first, f_lo @ w_first)
        fixL = jnp.where(is_rev[:, None], g_lo @ w_last, f_hi @ w_last)
        fix0 = jnp.where(valid[:, 0][:, None], fix0, shift_first)
        fixL = jnp.where(valid[:, Lo1 - 1][:, None], fixL, shift_last)
        pre = pre.at[:, 0, :].add(-fix0)
        pre = pre.at[:, Lo1 - 1, :].add(-fixL)
        h = jnp.maximum(pre + b1, 0.0).astype(compute_dtype)
        h = jax.lax.optimization_barrier(h)

        # layers 2..n windowed (Cin >= 96: direct conv is MXU-friendly)
        for conv, (st2, l2, h2) in zip(params["convs"][1:], spec[1:]):
            w = jnp.asarray(conv["w"], dtype=compute_dtype)
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(st2,), padding=[(l2, h2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(h + jnp.asarray(conv["b"]), 0.0).astype(compute_dtype)
        B2, L2, C2 = h.shape
        h = h.transpose(0, 2, 1).reshape(B2, C2 * L2)
        h = h @ jnp.asarray(params["fc1"]["w"], dtype=compute_dtype)
        h = jnp.maximum(h.astype(jnp.float32) + jnp.asarray(params["fc1"]["b"]), 0.0)
        h = h.astype(compute_dtype) @ jnp.asarray(params["fc2"]["w"], dtype=compute_dtype)
        logits = h.astype(jnp.float32) + jnp.asarray(params["fc2"]["b"])
        return logits_to_scaled_probs(logits)

    probs = jax.lax.map(one, (centers.reshape(nb, site_batch),
                              strands.reshape(nb, site_batch),
                              rstart.reshape(nb, site_batch),
                              rend.reshape(nb, site_batch)))
    return probs.reshape(n)


@partial(jax.jit, static_argnames=("site_batch", "kmer_size", "compute_dtype",
                                   "spec", "conv_impl", "block_rows"))
def call_sites_blocked(params, feats: jax.Array, centers: jax.Array,
                       strands: jax.Array, rstart: jax.Array,
                       rend: jax.Array, site_batch: int,
                       kmer_size: int = KMER_SIZE,
                       compute_dtype=jnp.float32,
                       spec: tuple | None = None,
                       conv_impl: str = "direct",
                       block_rows: int = 1 << 17) -> jax.Array:
    """Experimental block-local fetch: each batch's sites are sorted and
    span-capped by the host so one contiguous (block_rows, C) slice covers
    every window; per-site windows then slice the small block.  Exploits the
    ~99% overlap between neighboring sites' windows: HBM fetch drops from
    kmer rows/site to ~3 rows/site."""
    n = centers.shape[0]
    assert n % site_batch == 0
    nb = n // site_batch
    hk = kmer_size // 2

    def one(batch):
        c, s, rs, re = batch
        c = c.astype(jnp.int32)
        base = jnp.min(jnp.where(c > 0, c, jnp.iinfo(jnp.int32).max)) - hk
        base = jnp.clip(base, 0, max(feats.shape[0] - block_rows, 0))
        block = jax.lax.dynamic_slice(feats, (base, 0),
                                      (block_rows, feats.shape[1]))
        rel = jnp.clip(c - hk - base, 0, block_rows - kmer_size)

        def slice_one(r):
            return jax.lax.dynamic_slice(block, (r, 0),
                                         (kmer_size, block.shape[1]))

        w = jax.vmap(slice_one)(rel)
        j = jnp.arange(kmer_size, dtype=jnp.int32) - hk
        pos = c[:, None] + j[None, :]
        valid = (pos >= rs[:, None]) & (pos < re[:, None])
        w = w * valid[..., None].astype(w.dtype)
        C = w.shape[-1]
        perm = np.concatenate([REV_CHANNEL_PERM,
                               np.arange(8, C, dtype=np.int32)])
        w_rev = jnp.flip(w, axis=1)[..., jnp.asarray(perm)]
        w = jnp.where((s != 0)[:, None, None], w_rev, w)
        w = jax.lax.optimization_barrier(w)
        logits = dnamodnet_apply(params, w, compute_dtype=compute_dtype,
                                 spec=spec, conv_impl=conv_impl)
        return logits_to_scaled_probs(logits)

    probs = jax.lax.map(one, (centers.reshape(nb, site_batch),
                              strands.reshape(nb, site_batch),
                              rstart.reshape(nb, site_batch),
                              rend.reshape(nb, site_batch)))
    return probs.reshape(n)
