"""Genome-wide methylation quantification (`pileup`).

Replicates the reference two-pass algorithm (pileup.cpp:461-606):

Pass 1 (streaming over a coordinate-sorted mod-BAM):
  - parse MM/ML per read; histogram scaled probs per context classified by
    read-local sequence context, primary reads only (pileup.cpp:237-272)
  - for reads passing mapQ/identity filters, map each called site to genome
    coordinates via alignment-exact motif matching and spill
    (sid, soff, prob, motif) records to a temp file (pileup.cpp:485-505)

Then derive per-context adaptive thresholds (quant/threshold.py) and replay
the spill per chromosome into pcov/ncov arrays, emitting three 6-column BEDs
`chr start end freq% pcov ncov` with freq = 100*p/(p+n) (pileup.cpp:513-595).

The per-chromosome count accumulation is exposed as pure functions so the
multi-host path can psum partial (pcov, ncov) shards over a device mesh
instead of the reference's mutex merge.
"""
from __future__ import annotations

import os
import sys
import tempfile
from dataclasses import dataclass

import numpy as np

from ..features.sites import _IS_H  # A/C/T membership table
from ..io.bam import BamReader
from ..io.fasta import FastaDatabase
from ..io.mmtags import parse_mod_tags_flat
from ..utils.logging import log
from .alignment import expand_alignment
from .mapping import map_chg_sites, map_chh_sites, map_cpg_sites
from .threshold import resolve_threshold

_C, _G = ord("C"), ord("G")
_IS_D = np.zeros(256, dtype=bool)   # A/G/T (rev CHH inner bases)
for _c in b"AGT":
    _IS_D[_c] = True

SPILL_DTYPE = np.dtype(
    [("sid", "<i4"), ("soff", "<i4"), ("prob", "u1"), ("motif", "u1")])


@dataclass
class PileupConfig:
    min_mapq: int = 0        # reference default (pileup.cpp:18)
    min_identity: float = 0.0
    io_threads: int = 0      # 0 = physical cores (mod_options.cpp:120-132)

    def __post_init__(self):
        if self.io_threads <= 0:
            from ..utils.system import physical_core_count
            self.io_threads = physical_core_count()


def classify_read_mods(fwd_seq: np.ndarray, qoffs: np.ndarray) -> np.ndarray:
    """Read-local context class per mod: 0 CpG, 1 CHG, 2 CHH, -1 none.

    Vectorized pileup.cpp:237-271: 'C' sites classify by the forward 3-mer
    with CpG > CHG > CHH precedence; 'G' sites count as CHH only when the
    preceding 3-mer is a reverse CHH motif."""
    L = len(fwd_seq)
    cls = np.full(len(qoffs), -1, np.int8)
    if len(qoffs) == 0:
        return cls
    base = fwd_seq[qoffs]

    c_mask = base == _C
    c_off = qoffs[c_mask]
    nxt1 = np.where(c_off + 1 < L, fwd_seq[np.minimum(c_off + 1, L - 1)], 0)
    nxt2 = np.where(c_off + 2 < L, fwd_seq[np.minimum(c_off + 2, L - 1)], 0)
    is_cpg = (c_off + 1 < L) & (nxt1 == _G)
    is_chg = ~is_cpg & (c_off + 2 < L) & _IS_H[nxt1] & (nxt2 == _G)
    is_chh = ~is_cpg & ~is_chg & (c_off + 2 < L) & _IS_H[nxt1] & _IS_H[nxt2]
    c_cls = np.full(len(c_off), -1, np.int8)
    c_cls[is_cpg] = 0
    c_cls[is_chg] = 1
    c_cls[is_chh] = 2
    cls[c_mask] = c_cls

    g_mask = base == _G
    g_off = qoffs[g_mask]
    p1 = np.where(g_off - 1 >= 0, fwd_seq[np.maximum(g_off - 1, 0)], 0)
    p2 = np.where(g_off - 2 >= 0, fwd_seq[np.maximum(g_off - 2, 0)], 0)
    is_rev_chh = (g_off - 2 >= 0) & _IS_D[p2] & _IS_D[p1]
    g_cls = np.where(is_rev_chh, 2, -1).astype(np.int8)
    cls[g_mask] = g_cls
    return cls


def accumulate_counts(soffs: np.ndarray, probs: np.ndarray, motifs: np.ndarray,
                      thresholds: np.ndarray, chr_size: int):
    """(pcov, ncov, motif_map) per-position arrays for one chromosome.

    Pure-function equivalent of pileup.cpp:513-560; motif_map records the
    LAST motif class written per position (replicating file-order overwrite)
    with 255 = untouched."""
    thr = thresholds[motifs]
    pos = probs >= thr
    pcov = np.bincount(soffs[pos], minlength=chr_size).astype(np.int32)
    ncov = np.bincount(soffs[~pos], minlength=chr_size).astype(np.int32)
    motif_map = np.full(chr_size, 255, np.uint8)
    motif_map[soffs] = motifs          # fancy assignment: last write wins
    return pcov, ncov, motif_map


def write_bed_rows(out, chr_name: str, pcov, ncov, motif_map, motif: int,
                   span: tuple[int, int] | None = None) -> int:
    """Emit 6-column rows for one motif class; %g freq formatting matches the
    reference's default ostream double formatting (pileup.cpp:562-586).

    Row assembly is the pass-2 hot loop (was 33% of pileup wall): freq
    strings are cached per distinct (pcov, cov) pair - coverage is small so
    pairs are O(cov^2) while rows are millions - and rows are joined and
    written in 1M-row chunks instead of one stream write per row.  `out`
    may be binary (preferred: native row bytes write straight through) or
    text; `span` restricts output to positions [lo, hi) so one chromosome
    can be split across pass-2 workers."""
    import io as _io
    cov = pcov + ncov
    mask = (cov > 0) & (motif_map == motif)
    if span is None:
        rows = np.flatnonzero(mask)
    else:
        rows = np.flatnonzero(mask[span[0]:span[1]]) + span[0]
    is_text = isinstance(out, _io.TextIOBase)
    from ..io import native
    if native.available() and getattr(native._load(), "hm_bed_rows", None):
        # native row formatter (C snprintf %g == Python :g), ~15x the
        # cached-f-string loop below
        for lo in range(0, len(rows), 1 << 20):
            sel = rows[lo:lo + (1 << 20)]
            data = native.bed_rows(chr_name, sel, pcov[sel], cov[sel])
            out.write(data.decode() if is_text else data)
        return len(rows)
    cache: dict = {}
    for lo in range(0, len(rows), 1 << 20):
        sel = rows[lo:lo + (1 << 20)]
        parts = []
        for k, pi, ci in zip(sel.tolist(), pcov[sel].tolist(),
                             cov[sel].tolist()):
            key = (pi, ci)
            fs = cache.get(key)
            if fs is None:
                fs = cache[key] = f"{100.0 * pi / ci:g}"
            parts.append(f"{chr_name}\t{k}\t{k + 1}\t{fs}\t{pi}\t{ci - pi}\n")
        data = "".join(parts)
        out.write(data if is_text else data.encode())
    return len(rows)


def _accumulate_part(part, thresholds, pcov, ncov, motif_map,
                     size: int) -> None:
    """Accumulate one spill chunk into per-chromosome arrays in place
    (native single pass when built; numpy bincount fallback)."""
    from ..io import native
    if native.accum_counts(part["soff"], part["prob"], part["motif"],
                           thresholds, pcov, ncov, motif_map):
        return
    p, n, mm = accumulate_counts(
        part["soff"].astype(np.int64), part["prob"], part["motif"],
        thresholds, size)
    pcov += p
    ncov += n
    touched = mm != 255
    motif_map[touched] = mm[touched]


class PileupSpill:
    """Buffered spill of mapped mod records, replayed per chromosome.

    The TPU-scale analog of the reference's read_base_mods temp file
    (pileup.cpp:485-505): input order over a coordinate-sorted BAM keeps the
    spill sid-ordered, so replay is a sequential scan."""

    def __init__(self, n_chr: int, flush_records: int = 1 << 20, dir=None):
        self.chr_counts = np.zeros(n_chr, np.int64)
        self._buf: list[np.ndarray] = []
        self._buffered = 0
        self._flush_records = flush_records
        fd, self.path = tempfile.mkstemp(prefix="read_base_mods_", dir=dir)
        self._fh = os.fdopen(fd, "wb")

    def add(self, recs: np.ndarray) -> None:
        if len(recs) == 0:
            return
        np.add.at(self.chr_counts, recs["sid"], 1)
        self._buf.append(recs)
        self._buffered += len(recs)
        if self._buffered >= self._flush_records:
            self.flush()

    def flush(self) -> None:
        for b in self._buf:
            b.tofile(self._fh)
        self._buf.clear()
        self._buffered = 0

    def finish(self):
        self.flush()
        self._fh.close()

    def replay(self, chunk: int = 1 << 20):
        """Yield record chunks in file order."""
        with open(self.path, "rb") as f:
            while True:
                arr = np.fromfile(f, dtype=SPILL_DTYPE, count=chunk)
                if len(arr) == 0:
                    break
                yield arr

    def cleanup(self):
        try:
            os.remove(self.path)
        except OSError:
            pass


def _pass1_stream(reader, hdr, db, cfg, shard, bins, spill) -> int:
    """Pass 1 over the shard's reads: histogram + genome mapping + spill.

    The per-read expansion+mapping runs through the native single-call
    kernel (bamcore hm_map_mod_sites) when built - the reference's pass 1
    is likewise a tight C++ loop (pileup.cpp:208-353) - with the numpy
    pipeline kept as the bit-identical fallback."""
    from ..io import native
    use_native = native.available() and \
        getattr(native._load(), "hm_map_mod_sites", None) is not None

    from ..io.bam import BamRecord
    n_reads = 0
    read_id = -1
    sam_text = getattr(reader, "is_sam_text", False)
    while True:
        if sam_text:
            # SAM text births parsed records; taking them directly skips
            # the to_bytes/from_bytes round-trip next_raw() would add
            # (round-4 ADVICE).  Ownership still checked before any work
            # beyond the unavoidable line parse.
            rec = next(reader, None)
            if rec is None:
                break
            read_id += 1
            if not shard.owns_read(read_id):
                continue
        else:
            raw = reader.next_raw()
            if raw is None:
                break
            read_id += 1
            # cheap ownership check BEFORE record parse: non-owned reads
            # cost only the shared BGZF inflate, not BamRecord.from_bytes
            # (the reference's workers likewise skip by read-id under the
            # reader mutex, sam_batch.hpp:38-54).  The view must be
            # released before the next next_raw() or the rolling buffer
            # cannot compact.
            if not shard.owns_read(read_id):
                raw.release()
                continue
            rec = BamRecord.from_bytes(raw)
            raw.release()
        n_reads += 1
        if n_reads % 100000 == 0:
            log("%10d reads processed", n_reads)
        stored_seq = rec.seq_ascii()         # aligned orientation, reused below
        if rec.is_reverse:
            from ..constants import BASE_COMPLEMENT
            fwd_seq = BASE_COMPLEMENT[stored_seq[::-1]]
        else:
            fwd_seq = stored_seq
        qoffs, strands, codes, probs = parse_mod_tags_flat(rec, fwd_seq)
        if len(qoffs) == 0:
            continue

        if not rec.is_secondary_or_supplementary:
            # histogram: all codes, C/G bases only (pileup.cpp:238-271);
            # native classify+bincount in one pass when built
            if not native.hist_mods(fwd_seq, qoffs, probs, bins):
                keep = (fwd_seq[qoffs] == _C) | (fwd_seq[qoffs] == _G)
                cls = classify_read_mods(fwd_seq, qoffs[keep])
                pr = probs[keep]
                for m in range(3):
                    sel = cls == m
                    if sel.any():
                        bins[m] += np.bincount(pr[sel], minlength=256)

        if rec.mapq < cfg.min_mapq:
            continue
        if rec.is_unmapped:
            continue

        # read-position -> prob lookup for code 'm' mods (pileup.cpp:277-284)
        has_prob = np.zeros(rec.l_seq, np.uint8)
        prob_at = np.zeros(rec.l_seq, np.uint8)
        m_mask = codes == ord("m")
        has_prob[qoffs[m_mask]] = 1
        prob_at[qoffs[m_mask]] = probs[m_mask]

        res = None
        if use_native:
            sid = db.seq_name2id(hdr.tid2name(rec.refid))
            ops, lens = rec.cigar_ops()
            res = native.map_mod_sites(
                stored_seq, 1 if rec.is_reverse else 0,
                db.seq_bases(sid), rec.pos, ops, lens, has_prob, prob_at)
        if res is not None:
            pi, _epi, soffs, sprobs, motifs = res
            if pi < cfg.min_identity:
                continue
            if len(soffs):
                recs = np.empty(len(soffs), SPILL_DTYPE)
                recs["sid"] = sid
                recs["soff"] = soffs
                recs["prob"] = sprobs
                recs["motif"] = motifs
                spill.add(recs)
            continue

        aln = expand_alignment(rec, db, hdr.tid2name(rec.refid))
        if aln is None:
            continue
        if aln.pi < cfg.min_identity:
            continue
        has_prob = has_prob.astype(bool)
        out_parts = []
        for motif, (mq, ms) in enumerate((
                map_cpg_sites(aln), map_chg_sites(aln), map_chh_sites(aln))):
            if len(mq) == 0:
                continue
            sel = has_prob[mq]
            if not sel.any():
                continue
            part = np.empty(int(sel.sum()), SPILL_DTYPE)
            part["sid"] = aln.sid
            part["soff"] = ms[sel]
            part["prob"] = prob_at[mq[sel]]
            part["motif"] = motif
            out_parts.append(part)
        if out_parts:
            spill.add(np.concatenate(out_parts))
    return n_reads


def _pass2(db, thresholds, spill_sources, output_prefix: str,
           my_chroms, suffix: str) -> int:
    """Per-chromosome multi-way merge over sid-ordered spill streams; memory
    bounded by one chromosome (pileup.cpp:513-560).

    `my_chroms` is either a set of owned sids or a dict sid -> (lo, hi)
    position span, so a single chromosome can be range-split across
    workers (each accumulates the whole chromosome but writes only its
    span; BED part files concatenate in span order to the serial bytes)."""
    outs = {
        0: open(f"{output_prefix}.CpG.cov.bed{suffix}", "wb"),
        1: open(f"{output_prefix}.CHG.cov.bed{suffix}", "wb"),
        2: open(f"{output_prefix}.CHH.cov.bed{suffix}", "wb"),
    }
    rows = 0
    streams = [_sid_grouped(src) for src in spill_sources]
    heads = [next(s, None) for s in streams]
    while any(h is not None for h in heads):
        sid = min(h[0] for h in heads if h is not None)
        size = db.seq_length(sid)
        pcov = np.zeros(size, np.int32)
        ncov = np.zeros(size, np.int32)
        motif_map = np.full(size, 255, np.uint8)
        wanted = sid in my_chroms
        span = (my_chroms[sid] if isinstance(my_chroms, dict) and wanted
                else None)
        for i, stream in enumerate(streams):
            while heads[i] is not None and heads[i][0] == sid:
                part = heads[i][1]
                if wanted:
                    _accumulate_part(part, thresholds, pcov, ncov,
                                     motif_map, size)
                heads[i] = next(stream, None)
        if wanted:
            name = db.seq_name(sid)
            for m in range(3):
                rows += write_bed_rows(outs[m], name, pcov, ncov, motif_map,
                                       m, span=span)
    for f in outs.values():
        f.close()
    return rows


#: collective pass-2 chunk length: fixed so every process runs ONE compiled
#: psum program regardless of chromosome sizes (4 Mi positions = 48 MB of
#: (pcov, ncov, motif) int32 rows per participating local device)
PASS2_CHUNK = 1 << 22


def _pass2_collective(db, thresholds, spill, output_prefix: str, shard,
                      suffix: str, chunk: int = PASS2_CHUNK) -> int:
    """Distributed pass 2 via mesh collectives (SURVEY §5).

    Every process accumulates per-site (pcov, ncov, motif) partials from ITS
    OWN spill only, then the per-chunk `psum_site_partials_multihost`
    produces the global counts - replacing the round-3 design where every
    host replayed every host's spill over the shared filesystem (itself a
    stand-in for the reference's temp-file shuffle + mutex merge,
    pileup.cpp:158-167, 513-560).  The chromosome's round-robin owner writes
    the BED rows; a cheap per-chromosome chunk-occupancy psum keeps chunk
    collectives proportional to covered regions.  Collective order is
    deterministic: all processes walk sids 0..n-1 and the globally-touched
    chunk sets, so programs line up without any barrier beyond the psums
    themselves."""
    from ..parallel.collectives import (psum_i64_multihost,
                                        psum_site_partials_multihost)
    from ..parallel.dist import chromosome_ranges

    my_chroms = set(chromosome_ranges(db.num_seqs, shard))
    outs = {
        0: open(f"{output_prefix}.CpG.cov.bed{suffix}", "wb"),
        1: open(f"{output_prefix}.CHG.cov.bed{suffix}", "wb"),
        2: open(f"{output_prefix}.CHH.cov.bed{suffix}", "wb"),
    }
    rows = 0
    stream = _sid_grouped(spill)
    head = next(stream, None)
    for sid in range(db.num_seqs):
        size = db.seq_length(sid)
        pcov = np.zeros(size, np.int32)
        ncov = np.zeros(size, np.int32)
        motif_map = np.full(size, 255, np.uint8)
        while head is not None and head[0] == sid:
            _accumulate_part(head[1], thresholds, pcov, ncov, motif_map,
                             size)
            head = next(stream, None)
        touched = motif_map != 255
        menc = np.zeros(size, np.int32)
        menc[touched] = (shard.process_id * 4
                         + motif_map[touched].astype(np.int32) + 1)
        n_chunks = -(-size // chunk)
        flags = np.zeros(n_chunks, np.int64)
        for ci in range(n_chunks):
            sl = slice(ci * chunk, min((ci + 1) * chunk, size))
            if menc[sl].any() or pcov[sl].any() or ncov[sl].any():
                flags[ci] = 1
        gflags = psum_i64_multihost(flags)
        for ci in np.flatnonzero(gflags):
            lo = int(ci) * chunk
            hi = min(lo + chunk, size)
            pc = np.zeros(chunk, np.int32)
            nc = np.zeros(chunk, np.int32)
            me = np.zeros(chunk, np.int32)
            pc[:hi - lo] = pcov[lo:hi]
            nc[:hi - lo] = ncov[lo:hi]
            me[:hi - lo] = menc[lo:hi]
            gp, gn, gm = psum_site_partials_multihost(pc, nc, me)
            if sid in my_chroms:
                pcov[lo:hi] = gp[:hi - lo]
                ncov[lo:hi] = gn[:hi - lo]
                menc[lo:hi] = gm[:hi - lo]
        if sid in my_chroms:
            motif_map = np.where(menc > 0, (menc - 1) % 4,
                                 255).astype(np.uint8)
            name = db.seq_name(sid)
            for m in range(3):
                rows += write_bed_rows(outs[m], name, pcov, ncov,
                                       motif_map, m)
    for f in outs.values():
        f.close()
    return rows


def run_pileup(reference_path: str, mod_bam_path: str, output_prefix: str,
               cfg: PileupConfig | None = None,
               spill_dir: str | None = None,
               shard=None, bins_reduce=None,
               extra_spill_paths: list[str] | None = None,
               keep_spill: bool = False) -> dict:
    """Genome-wide quantification.

    Multi-host mode (shard = ShardSpec with num_processes > 1): this process
    histograms/maps only its round-robin read blocks, `bins_reduce` merges
    the 256-bin histograms across processes (e.g. a psum over the process
    mesh, parallel/collectives.psum_histograms - the collective replacement
    for the reference's mutex merge, pileup.cpp:158-167), pass 2 covers only
    this process's chromosome range using every process's spill file
    (extra_spill_paths via the shared filesystem), and BED rows are written
    to per-shard files merged with tools `merge-pileup-shards`.
    """
    from ..parallel.dist import ShardSpec, chromosome_ranges

    cfg = cfg or PileupConfig()
    shard = shard or ShardSpec()
    reader = BamReader(mod_bam_path, threads=cfg.io_threads)
    hdr = reader.header
    if hdr.n_refs == 0 or hdr.sort_order() != "coordinate":
        print("ERROR: Methylation frequency could not be computed due to the "
              "following errors:", file=sys.stderr)
        if hdr.n_refs == 0:
            print("BAM is not mapped", file=sys.stderr)
        if hdr.sort_order() != "coordinate":
            print("BAM is not sorted", file=sys.stderr)
        raise SystemExit(1)

    db = FastaDatabase(reference_path)
    bins = np.zeros((3, 256), np.int64)
    spill = PileupSpill(db.num_seqs, dir=spill_dir)
    n_reads = _pass1_stream(reader, hdr, db, cfg, shard, bins, spill)
    reader.close()
    spill.finish()

    if bins_reduce is not None:
        bins = bins_reduce(bins)
    thresholds = np.array([
        resolve_threshold(bins[0], "CpG"),
        resolve_threshold(bins[1], "CHG"),
        resolve_threshold(bins[2], "CHH"),
    ], np.uint8)

    suffix = "" if shard.num_processes == 1 else f".shard{shard.process_id:04d}"
    if shard.num_processes > 1:
        _write_chroms_sidecar(output_prefix, db)
    my_chroms = set(chromosome_ranges(db.num_seqs, shard))
    spill_sources = [spill] + [
        _ExternalSpill(p) for p in (extra_spill_paths or [])]
    rows = _pass2(db, thresholds, spill_sources, output_prefix, my_chroms,
                  suffix)
    if not keep_spill:
        spill.cleanup()
    return {
        "reads": n_reads,
        "thresholds": thresholds.tolist(),
        "bed_rows": rows,
        "bins": bins,
        "spill_path": spill.path if keep_spill else None,
    }


def _sid_grouped(src, chunk: int = 1 << 20):
    """Yield (sid, record-part) pairs from a sid-ordered spill stream."""
    for arr in src.replay(chunk):
        sids = arr["sid"]
        if len(sids) and sids[0] == sids[-1]:    # single-sid chunk: no copy
            yield int(sids[0]), arr
            continue
        # sid-ordered: split at run boundaries with slices, not masks
        cuts = np.flatnonzero(np.diff(sids)) + 1
        for lo, hi in zip(np.r_[0, cuts], np.r_[cuts, len(sids)]):
            yield int(sids[lo]), arr[lo:hi]


class _ExternalSpill:
    """Replay wrapper over another shard's spill file path."""

    def __init__(self, path: str):
        self.path = path

    def replay(self, chunk: int = 1 << 20):
        with open(self.path, "rb") as f:
            while True:
                arr = np.fromfile(f, dtype=SPILL_DTYPE, count=chunk)
                if len(arr) == 0:
                    break
                yield arr


def _pass2_worker(args):
    """Multiprocessing worker: pass 2 over a contiguous (sid, position)
    span set, writing per-context part files (suffix) the parent
    concatenates in span order.  Runs jax-free (numpy only)."""
    (reference_path, thresholds, spill_paths, prefix, spans, suffix) = args
    db = _get_db(reference_path)
    return _pass2(db, np.asarray(thresholds, np.uint8),
                  [_ExternalSpill(p) for p in spill_paths],
                  prefix, spans, suffix)


def _pass1_worker(args):
    """Multiprocessing worker: run pass 1 for one shard, return
    (bins, spill_path, n_reads).  Runs jax-free (numpy only)."""
    (reference_path, mod_bam_path, cfg, shard, spill_dir) = args
    from ..parallel.dist import ShardSpec  # noqa: F401  (unpickling type)

    reader = BamReader(mod_bam_path, threads=2)
    hdr = reader.header
    db = _get_db(reference_path)
    bins = np.zeros((3, 256), np.int64)
    spill = PileupSpill(db.num_seqs, dir=spill_dir)
    n_reads = _pass1_stream(reader, hdr, db, cfg, shard, bins, spill)
    reader.close()
    spill.finish()
    return bins, spill.path, n_reads


_DB_CACHE: dict = {}


def _get_db(path: str, quiet: bool = True) -> FastaDatabase:
    """Per-process FastaDatabase cache keyed by (path, mtime): worker
    processes persist across pileup calls (pool cache below), so repeated
    quantification over the same reference skips the ~30 ms reload (the
    reference holds its HbnDatabase for the process lifetime too)."""
    key = (os.path.abspath(path), os.path.getmtime(path))
    db = _DB_CACHE.get(key)
    if db is None:
        _DB_CACHE.clear()
        db = _DB_CACHE[key] = FastaDatabase(path, quiet=quiet)
    return db


_POOL_CACHE: dict = {}


def _get_worker_pool(workers: int):
    """Spawned numpy-only worker pool, cached per size: spawning + child
    imports cost ~0.5 s, which would otherwise recur on every pileup call
    in library use (the reference keeps its pthread pool for the process
    lifetime too, pileup.cpp:494-504)."""
    import atexit
    import multiprocessing as mp

    from ..utils.system import worker_spawn_env

    pool = _POOL_CACHE.get(workers)
    if pool is None:
        ctx = mp.get_context("spawn")
        with worker_spawn_env():
            pool = ctx.Pool(workers)
        _POOL_CACHE[workers] = pool
        atexit.register(pool.terminate)
    return pool


def run_pileup_parallel(reference_path: str, mod_bam_path: str,
                        output_prefix: str, cfg: PileupConfig | None = None,
                        workers: int = 8, spill_dir: str | None = None) -> dict:
    """Single-host parallel pileup: pass 1 fans out over `workers` local
    processes with round-robin read shards (the process analog of the
    reference's pthread pool, pileup.cpp:494-504), histograms sum in the
    parent, pass 2 multi-way-merges all spill files."""
    from ..parallel.dist import ShardSpec

    cfg = cfg or PileupConfig()
    if workers <= 1:
        return run_pileup(reference_path, mod_bam_path, output_prefix, cfg,
                          spill_dir=spill_dir)
    jobs = [(reference_path, mod_bam_path, cfg,
             ShardSpec(i, workers, batch_size=100), spill_dir)
            for i in range(workers)]
    pool = _get_worker_pool(workers)
    try:
        results = pool.map(_pass1_worker, jobs)
    except Exception:
        # a dead/broken pool poisons every later call: drop it so the next
        # call spawns a fresh one, then re-raise
        _POOL_CACHE.pop(workers, None)
        pool.terminate()
        raise
    bins = np.zeros((3, 256), np.int64)
    spill_paths = []
    n_reads = 0
    for b, path, n in results:
        bins += b
        spill_paths.append(path)
        n_reads += n

    thresholds = np.array([
        resolve_threshold(bins[0], "CpG"),
        resolve_threshold(bins[1], "CHG"),
        resolve_threshold(bins[2], "CHH"),
    ], np.uint8)
    db = _get_db(reference_path, quiet=False)
    lens = [db.seq_length(s) for s in range(db.num_seqs)]
    total = sum(lens)
    # balanced contiguous (sid, position) spans: chromosomes are split at
    # position boundaries, so even a single-chromosome genome fans out over
    # the pool (the reference's pass 2 is serial, pileup.cpp:513-595; rows
    # are per-position independent, and part files concatenated in span
    # order reproduce the serial bytes exactly).  Tiny genomes stay serial.
    n_jobs = min(workers, max(1, total // (1 << 18)))
    if n_jobs > 1:
        import shutil

        target = -(-total // n_jobs)
        spans: list[dict] = [dict() for _ in range(n_jobs)]
        j = acc = 0
        for s, L in enumerate(lens):
            off = 0
            while off < L:
                take = min(L - off, target - acc)
                spans[j][s] = (off, off + take)
                acc += take
                off += take
                if acc >= target and j < n_jobs - 1:
                    j += 1
                    acc = 0
        spans = [sp for sp in spans if sp]
        jobs2 = [(reference_path, thresholds.tolist(), spill_paths,
                  output_prefix, sp, f".part{i}")
                 for i, sp in enumerate(spans)]
        try:
            rows = sum(pool.map(_pass2_worker, jobs2))
        except Exception:
            _POOL_CACHE.pop(workers, None)
            pool.terminate()
            raise
        for ctxname in ("CpG", "CHG", "CHH"):
            final = f"{output_prefix}.{ctxname}.cov.bed"
            with open(final, "wb") as outf:
                for i in range(len(spans)):
                    part = f"{final}.part{i}"
                    with open(part, "rb") as pf:
                        shutil.copyfileobj(pf, outf)
                    os.remove(part)
    else:
        rows = _pass2(db, thresholds,
                      [_ExternalSpill(p) for p in spill_paths],
                      output_prefix, set(range(db.num_seqs)), "")
    for p in spill_paths:
        try:
            os.remove(p)
        except OSError:
            pass
    return {"reads": n_reads, "thresholds": thresholds.tolist(),
            "bed_rows": rows, "bins": bins}


def run_pileup_multihost(reference_path: str, mod_bam_path: str,
                         output_prefix: str, shard,
                         cfg: PileupConfig | None = None,
                         spill_dir: str | None = None) -> dict:
    """True multi-host pileup under jax.distributed.

    Every process: pass 1 over its round-robin read shard -> spill locally
    -> psum the histograms across processes -> collective pass 2
    (_pass2_collective: per-chunk (pcov, ncov, motif) psum/pmax over the
    process mesh; no process reads another's spill and no shared-FS spill
    exchange is needed) -> write per-shard BEDs for its round-robin
    chromosomes.  Process 0 concatenates afterwards with
    merge_pileup_shards (or the merge-pileup-shards CLI)."""
    from ..parallel.collectives import psum_histograms_multihost

    cfg = cfg or PileupConfig()
    reader = BamReader(mod_bam_path, threads=cfg.io_threads)
    hdr = reader.header
    db = FastaDatabase(reference_path)
    bins = np.zeros((3, 256), np.int64)
    spill = PileupSpill(db.num_seqs, dir=spill_dir)
    n_reads = _pass1_stream(reader, hdr, db, cfg, shard, bins, spill)
    reader.close()
    spill.finish()

    # collective histogram merge (the cross-process replacement for the
    # reference's mutex merge, pileup.cpp:158-167); also the pass-1 barrier
    bins = psum_histograms_multihost(bins)
    thresholds = np.array([
        resolve_threshold(bins[0], "CpG"),
        resolve_threshold(bins[1], "CHG"),
        resolve_threshold(bins[2], "CHH"),
    ], np.uint8)

    _write_chroms_sidecar(output_prefix, db)
    suffix = f".shard{shard.process_id:04d}"
    rows = _pass2_collective(db, thresholds, spill, output_prefix, shard,
                             suffix)
    spill.cleanup()
    return {"reads": n_reads, "thresholds": thresholds.tolist(),
            "bed_rows": rows, "bins": bins}


def _write_chroms_sidecar(output_prefix: str, db) -> None:
    """Record the reference chromosome names in sid order so
    merge_pileup_shards can interleave shard BEDs back into global sid
    order without re-reading the FASTA.  Atomic (temp + rename) because
    every multihost process writes the same content."""
    tmp = f"{output_prefix}.chroms.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        for sid in range(db.num_seqs):
            f.write(db.seq_name(sid) + "\n")
    os.replace(tmp, f"{output_prefix}.chroms")


def merge_pileup_shards(output_prefix: str, n_shards: int,
                        chrom_names: list[str] | None = None) -> None:
    """Interleave per-shard BED files back into global sid order.

    Each shard's BED holds blocks of rows for the chromosomes it owns
    (round-robin over sid), in ascending sid order within the shard - so the
    merged output must interleave one chromosome block at a time, not
    concatenate shard-major, to be byte-equal to the single-process output
    (which emits chromosomes in sid order, pileup.cpp:513-595).  The sid
    order comes from `chrom_names` or the `{output_prefix}.chroms` sidecar
    written by the sharded pileup runs; chromosomes with no rows are
    naturally skipped."""
    if chrom_names is None:
        sidecar = f"{output_prefix}.chroms"
        with open(sidecar) as f:
            chrom_names = [line.rstrip("\n") for line in f]
    for ctx in ("CpG", "CHG", "CHH"):
        paths = [f"{output_prefix}.{ctx}.cov.bed.shard{s:04d}"
                 for s in range(n_shards)]
        readers = [open(p) if os.path.exists(p) else None for p in paths]
        heads = [r.readline() if r is not None else "" for r in readers]
        with open(f"{output_prefix}.{ctx}.cov.bed", "w") as out:
            for name in chrom_names:
                for i, r in enumerate(readers):
                    if r is None:
                        continue
                    while heads[i] and heads[i].split("\t", 1)[0] == name:
                        out.write(heads[i])
                        heads[i] = r.readline()
        for r in readers:
            if r is not None:
                r.close()
