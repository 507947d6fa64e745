"""Read-level 5mC calling engine: BAM -> mod-BAM with MM/ML/MN tags.

TPU-first redesign of the reference `hifimeth call` pipeline
(mod_main.cpp:303-412).  Instead of a pthread pool with per-thread 32-sample
OpenVINO batches, reads are packed host-side into large flat buffers, shipped
to the device once, featurized once (amortized over ~100x overlapping
windows), and all candidate sites are called in big fixed-shape batches per
context.  Output records keep input order (the reference sorts by read id per
10k batch, mod_main.cpp:352-362; a single ordered stream gives the same
contract).

Behavioral parity with the reference:
 - reads shorter than min_read_size or without kinetics pass through
   unannotated (mod_main.cpp:189-196)
 - per-read calls are sorted by qoff and split into fwd ('C') / rev ('G')
   series before MM/ML construction (mod_main.cpp:228-253)
 - kinetics tags are stripped unless keep_kinetics (mod_main.cpp:119-143)
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CONTEXTS, FWD, KMER_SIZE
from ..features import sites as sitefind
from ..features.read_decode import decode_read, native_fwd_seq
from ..features.windows import call_sites, featurize_planes
from ..io.bam import BamReader, BamRecord, BamWriter
from ..io.mmtags import build_mod_tags
from ..model.cnn import conv_spec, load_params_npz
from ..utils.logging import bytes_to_datasize, format_with_commas, log

DEFAULT_MODEL_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "models")


def default_model_dir() -> str:
    """models/ next to the package root (mirrors the reference's
    <exe_dir>/models default, mod_options.cpp:73-78)."""
    return os.path.normpath(DEFAULT_MODEL_DIR)


@dataclass
class CallConfig:
    model_dir: str = ""
    contexts: tuple[str, ...] = CONTEXTS
    min_read_size: int = 1000            # reference default (mod_options.cpp:10)
    site_batch: int = 8192
    buffer_bases: int = 1 << 22
    keep_kinetics: bool = False
    read_batch_size: int = 10000         # stats/progress granularity
    compute_dtype: str = "float32"       # or "bfloat16"
    io_threads: int = 8

    def resolve_model_dir(self) -> str:
        return self.model_dir or default_model_dir()


@dataclass
class _PendingRead:
    rec: BamRecord
    fwd_seq: np.ndarray | None = None    # set iff the read was called
    # per-context site slices into the flush's site arrays
    site_slices: dict = field(default_factory=dict)


class ModelSet:
    """Per-context CNN parameters living on the device."""

    def __init__(self, model_dir: str, contexts=CONTEXTS):
        self.params = {}
        self.specs = {}
        self.kmer = KMER_SIZE
        kmer_path = os.path.join(model_dir, "kmer.txt")
        if os.path.exists(kmer_path):
            with open(kmer_path) as f:
                self.kmer = int(f.read().strip())
        for ctx in contexts:
            path = os.path.join(model_dir, f"{ctx}.npz")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"model file {path} not found; run `hifimeth-tpu import-model` "
                    f"to convert reference ONNX models")
            params = load_params_npz(path)
            self.specs[ctx] = conv_spec(params)
            # device-put weight tensors; geometry lives in the static spec
            self.params[ctx] = {
                "bn0": {k: jnp.asarray(v) for k, v in params["bn0"].items()},
                "convs": [{"w": jnp.asarray(c["w"]), "b": jnp.asarray(c["b"])}
                          for c in params["convs"]],
                "fc1": {k: jnp.asarray(v) for k, v in params["fc1"].items()},
                "fc2": {k: jnp.asarray(v) for k, v in params["fc2"].items()},
            }
            log("loaded %s model from %s (kmer=%d)", ctx, path, self.kmer)


class CallEngine:
    def __init__(self, cfg: CallConfig):
        self.cfg = cfg
        self.models = ModelSet(cfg.resolve_model_dir(), cfg.contexts)
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else jnp.float32)
        self._reset_buffer()
        self.stats = {ctx: 0 for ctx in cfg.contexts}
        self.stats.update(reads=0, bases=0, called_reads=0)

    # -- packing -----------------------------------------------------------
    def _reset_buffer(self):
        cap = self.cfg.buffer_bases
        self._planes = np.zeros((5, cap), dtype=np.uint8)
        self._fill = 0
        self._pending: list[_PendingRead] = []
        self._sites = {ctx: {"centers": [], "strands": [], "rstart": [], "rend": []}
                       for ctx in self.cfg.contexts}

    def _find_sites(self, ctx: str, seq: np.ndarray):
        if ctx == "CpG":
            offs = sitefind.cpg_sites(seq)
            strands = np.zeros(len(offs), np.uint8)
        elif ctx == "CHG":
            offs = sitefind.chg_sites(seq)
            strands = np.zeros(len(offs), np.uint8)
        elif ctx == "CHH":
            offs, strands = sitefind.chh_sites(seq)
        else:
            raise ValueError(f"unknown context {ctx}")
        return offs, strands

    def add_read(self, rec: BamRecord, out: list):
        """Queue one record; `out` receives (rec, results-ready) in order."""
        self.stats["reads"] += 1
        self.stats["bases"] += rec.l_seq
        if rec.l_seq < self.cfg.min_read_size:
            self._pending.append(_PendingRead(rec))
            return
        read = decode_read(rec)
        if read is None:
            self._pending.append(_PendingRead(rec))
            return
        if read.size > self.cfg.buffer_bases:
            raise ValueError(
                f"read {rec.qname} ({read.size} bp) exceeds buffer capacity "
                f"{self.cfg.buffer_bases}; raise --buffer-bases")
        if self._fill + read.size > self.cfg.buffer_bases:
            self.flush(out)
        start = self._fill
        end = start + read.size
        self._planes[0, start:end] = read.codes
        self._planes[1, start:end] = read.fi
        self._planes[2, start:end] = read.fp
        self._planes[3, start:end] = read.ri
        self._planes[4, start:end] = read.rp
        self._fill = end

        pend = _PendingRead(rec, fwd_seq=read.seq)
        for ctx in self.cfg.contexts:
            offs, strands = self._find_sites(ctx, read.seq)
            s = self._sites[ctx]
            lo = sum(len(c) for c in s["centers"])
            s["centers"].append(offs.astype(np.int32) + start)
            s["strands"].append(strands)
            s["rstart"].append(np.full(len(offs), start, np.int32))
            s["rend"].append(np.full(len(offs), end, np.int32))
            pend.site_slices[ctx] = (lo, lo + len(offs), offs, strands)
            self.stats[ctx] += len(offs)
        self.stats["called_reads"] += 1
        self._pending.append(pend)

    # -- device flush ------------------------------------------------------
    def _call_context(self, ctx: str, feats, s) -> np.ndarray:
        centers = np.concatenate(s["centers"]) if s["centers"] else np.empty(0, np.int32)
        n = len(centers)
        if n == 0:
            return np.empty(0, np.uint8)
        strands = np.concatenate(s["strands"])
        rstart = np.concatenate(s["rstart"])
        rend = np.concatenate(s["rend"])
        bs = self.cfg.site_batch
        pad = (-n) % bs
        if pad:
            centers = np.concatenate([centers, np.zeros(pad, np.int32)])
            strands = np.concatenate([strands, np.zeros(pad, np.uint8)])
            rstart = np.concatenate([rstart, np.zeros(pad, np.int32)])
            rend = np.concatenate([rend, np.zeros(pad, np.int32)])
        outs = []
        params = self.models.params[ctx]
        for i in range(0, len(centers), bs):
            outs.append(call_sites(
                params, feats,
                jnp.asarray(centers[i:i + bs]), jnp.asarray(strands[i:i + bs]),
                jnp.asarray(rstart[i:i + bs]), jnp.asarray(rend[i:i + bs]),
                kmer_size=self.models.kmer,
                compute_dtype=self.compute_dtype,
                spec=self.models.specs[ctx]))
        probs = np.concatenate([np.asarray(o) for o in outs])
        return probs[:n]

    def flush(self, out: list):
        """Run the device pipeline on the packed buffer, attach MM/ML/MN, and
        append finished records to `out` in input order."""
        if self._fill > 0:
            feats = featurize_planes(jnp.asarray(self._planes))
            probs = {ctx: self._call_context(ctx, feats, self._sites[ctx])
                     for ctx in self.cfg.contexts}
        else:
            probs = {ctx: np.empty(0, np.uint8) for ctx in self.cfg.contexts}

        for pend in self._pending:
            rec = pend.rec
            if pend.fwd_seq is None:
                out.append(rec)
                continue
            qoffs_all, strands_all, probs_all = [], [], []
            for ctx, (lo, hi, offs, strands) in pend.site_slices.items():
                qoffs_all.append(offs)
                strands_all.append(strands)
                probs_all.append(probs[ctx][lo:hi])
            qoffs = np.concatenate(qoffs_all) if qoffs_all else np.empty(0, np.int64)
            strands = np.concatenate(strands_all) if strands_all else np.empty(0, np.uint8)
            pvals = np.concatenate(probs_all) if probs_all else np.empty(0, np.uint8)
            fwd_mask = strands == FWD
            fq, fp = qoffs[fwd_mask], pvals[fwd_mask]
            rq, rp = qoffs[~fwd_mask], pvals[~fwd_mask]
            fo = np.argsort(fq, kind="stable")
            ro = np.argsort(rq, kind="stable")
            build_mod_tags(rec, pend.fwd_seq, fq[fo], fp[fo], rq[ro], rp[ro],
                           keep_kinetics=self.cfg.keep_kinetics)
            out.append(rec)
        self._reset_buffer()


def run_call(in_bam: str, out_bam: str, cfg: CallConfig,
             cmdline: str = "hifimeth-tpu call") -> dict:
    """End-to-end `call`: returns the stats dict."""
    from .. import __version__

    reader = BamReader(in_bam, threads=cfg.io_threads)
    header = reader.header.with_pg_line("hifimeth-tpu", __version__, cmdline)
    writer = BamWriter(out_bam, header, threads=cfg.io_threads)
    engine = CallEngine(cfg)

    done: list[BamRecord] = []
    batch_idx = 0
    next_log = cfg.read_batch_size
    for rec in reader:
        engine.add_read(rec, done)
        if engine.stats["reads"] >= next_log:
            log("%10d reads processed", engine.stats["reads"])
            next_log += cfg.read_batch_size
        if done:
            for r in done:
                writer.write(r)
            done.clear()
            batch_idx += 1
    engine.flush(done)
    for r in done:
        writer.write(r)
    writer.close()
    reader.close()

    import sys

    s = engine.stats
    log("Done.")
    print("******** Final stats:", file=sys.stderr)
    print(f"  ## Reads: {s['reads']}", file=sys.stderr)
    print(f"  ## Bases: {bytes_to_datasize(s['bases'])}", file=sys.stderr)
    for ctx in cfg.contexts:
        if s[ctx]:
            print(f"  ## {ctx} samples: {format_with_commas(s[ctx])}",
                  file=sys.stderr)
    sys.stderr.flush()
    return s
