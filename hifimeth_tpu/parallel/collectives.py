"""Mesh collectives for distributed quantification.

The reference merges per-thread histograms and per-site (pcov, ncov) counts
under a mutex (pileup.cpp:158-167, mod_main.cpp:255-261).  The TPU-native
equivalent: each shard (chip/host) accumulates local partials, and a single
`psum` over the mesh's data axis produces the global result - the collective
rides ICI/DCN instead of a lock.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def psum_histograms(mesh: Mesh, local_bins: np.ndarray) -> np.ndarray:
    """All-reduce per-shard histograms: local_bins (n_shards, 3, 256) with
    shard i holding its local counts -> summed (3, 256) on every shard.

    Used in place of the reference's locked `add_mods` histogram merge."""
    n = mesh.shape["data"]
    assert local_bins.shape[0] == n

    @partial(shard_map, mesh=mesh, in_specs=P("data", None, None),
             out_specs=P("data", None, None))
    def _merge(b):
        return jax.lax.psum(b, "data")

    arr = jax.device_put(
        jnp.asarray(local_bins),
        NamedSharding(mesh, P("data", None, None)))
    out = _merge(arr)
    return np.asarray(out)[0]


def psum_site_counts(mesh: Mesh, pcov_shards: np.ndarray,
                     ncov_shards: np.ndarray):
    """All-reduce per-shard (pcov, ncov) partial count arrays for one genome
    range: (n_shards, L) each -> global (L,), (L,).

    Replaces the reference's spill-file + serial per-chromosome accumulation
    when quantification runs sharded across chips/hosts."""
    n = mesh.shape["data"]
    assert pcov_shards.shape[0] == n and ncov_shards.shape[0] == n

    @partial(shard_map, mesh=mesh, in_specs=(P("data", None), P("data", None)),
             out_specs=(P("data", None), P("data", None)))
    def _merge(p, c):
        return jax.lax.psum(p, "data"), jax.lax.psum(c, "data")

    sharding = NamedSharding(mesh, P("data", None))
    p = jax.device_put(jnp.asarray(pcov_shards), sharding)
    c = jax.device_put(jnp.asarray(ncov_shards), sharding)
    gp, gc = _merge(p, c)
    return np.asarray(gp)[0], np.asarray(gc)[0]


def psum_histograms_multihost(local_bins: np.ndarray) -> np.ndarray:
    """Cross-PROCESS histogram all-reduce for jax.distributed runs.

    Each process contributes its local (3, 256) bins; the psum over the
    process-spanning device mesh returns the global bins to every process.
    Doubles as the pass-1 -> pass-2 barrier of distributed pileup."""
    import jax
    from jax.experimental import multihost_utils

    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    # one leading-axis row per LOCAL device (a process may hold several,
    # e.g. virtual CPU meshes); this process's bins ride on row 0, zeros on
    # the rest, so the psum over all rows is exactly the cross-process sum
    n_local = len(jax.local_devices())
    local = np.zeros((n_local, 3, 256), np.int64)
    local[0] = np.asarray(local_bins, np.int64)
    g = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))

    @partial(shard_map, mesh=mesh, in_specs=P("data", None, None),
             out_specs=P("data", None, None))
    def _merge(b):
        return jax.lax.psum(b, "data")

    out = _merge(g)
    lo = multihost_utils.global_array_to_host_local_array(
        out, mesh, P("data", None, None))
    return np.asarray(lo)[0]


def all_gather_u8(mesh: Mesh, local: np.ndarray) -> np.ndarray:
    """Gather per-shard u8 result vectors (n_shards, B) -> (n_shards*B,) in
    shard order; the deterministic-ordering analog of the reference's
    read-id sort per batch."""
    @partial(shard_map, mesh=mesh, in_specs=P("data", None),
             out_specs=P("data", None))
    def _gather(x):
        g = jax.lax.all_gather(x, "data")        # (n, 1, B) per shard
        return g.reshape(1, -1)

    arr = jax.device_put(jnp.asarray(local), NamedSharding(mesh, P("data", None)))
    out = _gather(arr)
    return np.asarray(out)[0]
