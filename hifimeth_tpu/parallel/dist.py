"""Multi-host distribution.

The reference is a single-process tool; its unit of parallelism is one read
pulled from a mutex-guarded reader (sam_batch.hpp:38-54).  The TPU-native
scale-out keeps that granularity but lifts it to hosts:

 - `call`: every host streams the same input BAM and processes the read
   batches assigned to it by round-robin over read_batch_size blocks
   (deterministic, no coordination); each host writes an ordered shard BAM
   and `merge_shard_bams` interleaves them back into the reference's
   read-id order.  During inference DCN does no work - exactly the design
   SURVEY.md section 2.5 calls for.
 - `pileup`: each host histograms + maps its read shard; 256-bin histograms
   are summed with a psum collective over the process mesh
   (parallel/collectives.py) instead of the reference's mutex merge; spill
   shards are replayed per chromosome range per host.

jax.distributed initialization is environment-driven (JAX_COORDINATOR etc.)
and optional: everything degrades to a single process.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..io.bam import BamReader, BamWriter
from ..utils.logging import log


@dataclass
class ShardSpec:
    process_id: int = 0
    num_processes: int = 1
    batch_size: int = 10000      # reads per round-robin block

    def owns_read(self, read_id: int) -> bool:
        return (read_id // self.batch_size) % self.num_processes == self.process_id


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> ShardSpec:
    """Initialize jax.distributed from args or JAX_* env vars; returns the
    ShardSpec for this process.  No-op single-process spec when unset."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return ShardSpec()
    num_processes = num_processes or int(os.environ["JAX_NUM_PROCESSES"])
    process_id = process_id if process_id is not None else int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    log("jax.distributed initialized: process %d/%d", process_id, num_processes)
    return ShardSpec(process_id=process_id, num_processes=num_processes)


def shard_path(base: str, spec: ShardSpec) -> str:
    if spec.num_processes == 1:
        return base
    return f"{base}.shard{spec.process_id:04d}"


def merge_shard_bams(out_path: str, shard_paths: list[str],
                     batch_size: int = 10000, io_threads: int = 8) -> int:
    """Interleave ordered shard BAMs back into global read order.

    Shard i holds the round-robin blocks (block_idx % n == i) in order, so
    the merge pulls batch_size records from each shard in rotation.
    Returns the number of records written."""
    readers = [BamReader(p, threads=2) for p in shard_paths]
    writer = BamWriter(out_path, readers[0].header, threads=io_threads)
    n = 0
    active = [True] * len(readers)
    while any(active):
        wrote_any = False
        for i, rd in enumerate(readers):
            if not active[i]:
                continue
            for _ in range(batch_size):
                raw = rd.next_raw()
                if raw is None:
                    active[i] = False
                    break
                writer.write_raw(raw)
                raw.release()   # the view pins the reader's rolling buffer
                n += 1
                wrote_any = True
        if not wrote_any:
            break
    writer.close()
    for rd in readers:
        rd.close()
    return n


def sharded_read_stream(reader: BamReader, spec: ShardSpec):
    """Yield (read_id, record) for the reads this process owns.

    Non-owned records are skipped cheaply (raw-record scan, no parse)."""
    from ..io.bam import BamRecord

    read_id = 0
    while True:
        raw = reader.next_raw()
        if raw is None:
            return
        if spec.owns_read(read_id):
            rec = BamRecord.from_bytes(raw)
            raw.release()   # the view pins the reader's rolling buffer
            yield read_id, rec
        else:
            raw.release()
        read_id += 1


def chromosome_ranges(n_chr: int, spec: ShardSpec) -> list[int]:
    """Chromosomes this process owns for pileup pass 2 (round robin)."""
    return [c for c in range(n_chr)
            if c % spec.num_processes == spec.process_id]
