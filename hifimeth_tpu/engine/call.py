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
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CONTEXTS, FWD, KMER_SIZE
from ..features import sites as sitefind
from ..features.read_decode import decode_read
from ..features.windows import (call_sites_batched, call_sites_grid,
                                featurize_planes, featurize_planes_folded,
                                featurize_planes_t_seg)
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
    buffer_bases: int = 1 << 21          # packed-buffer CAPACITY (static jit
                                         # shape: featurize/table programs
                                         # compile once per cap)
    flush_bases: int = 768 << 10         # flush GRANULARITY (768 Ki):
                                         # dispatch once this many bases are
                                         # packed (0 = buffer_bases).
                                         # Smaller flushes pipeline host
                                         # decode / device compute / async
                                         # emit at finer grain WITHOUT
                                         # changing any compiled shape - the
                                         # buffer stays cap-sized and only
                                         # filled segments ship
                                         # (featurize_planes_t_seg zero-
                                         # fills the tail).  Round-3 sweeps
                                         # put 448-512 Ki ahead of coarser
                                         # sizes; after the round-5
                                         # tail-chunk merge + segment-
                                         # aligned flush cut, interleaved
                                         # A/B puts 768 Ki ahead of 512 Ki
                                         # in 4/4 paired rounds (best
                                         # 1.37 M vs 1.27 M sites/s)
    flush_ramp: tuple = (1 << 17, 1 << 18)
                                         # flush-size RAMP: the first
                                         # flushes dispatch at these smaller
                                         # thresholds so the device starts
                                         # computing while the host is still
                                         # in its first packing pass (trace:
                                         # ~0.3 s of a ~0.8 s run elapsed
                                         # before the first 512 Ki flush).
                                         # Same compiled programs - smaller
                                         # flushes just use smaller bucket
                                         # counts.  () disables
    keep_kinetics: bool = False
    read_batch_size: int = 10000         # stats/progress granularity
    compute_dtype: str = "float32"       # or "bfloat16"
    conv_impl: str = "direct"            # direct | im2col | auto
    gather_impl: str = "auto"            # auto: pallas group-fetch on TPU,
                                         # folded on CPU; or slice | folded |
                                         # pallas (retired experimental paths
                                         # live in scripts/experimental_gathers)
    feat_channels: int = 8               # zero-pad table width (8|32|128):
                                         # wider rows = faster window fetch
    data_parallel: bool = False          # shard site batches over local chips
    stats_json: str = ""                 # write machine-readable run stats
    io_threads: int = 8                  # BGZF codec pool; the reference
                                         # fixes its htslib IO pool at 8
                                         # threads (sam_batch.hpp:19)
    decode_workers: int = -1             # threads running decode_read +
                                         # scan_all ahead of the packer
                                         # (-1 auto: cores-1 capped at 4,
                                         # min 1; 0 = inline).  The
                                         # reference analog: its N worker
                                         # threads each do ALL per-read
                                         # host work concurrently
                                         # (sam_batch.hpp:38-54); here the
                                         # device calls sites, so only
                                         # decode/site-scan moves off the
                                         # main packing thread
    async_emit: bool = True              # resolve/emit flush N in a worker
                                         # thread while the main thread
                                         # decodes/packs N+1 (needs a record
                                         # sink, see CallEngine.sink); the
                                         # reference analog is its dedicated
                                         # htslib writer pool + per-batch
                                         # join (mod_main.cpp:316-362)

    def resolve_model_dir(self) -> str:
        return self.model_dir or default_model_dir()


#: sentinel for add_read's `decoded` argument ("compute inline")
_UNSET = object()


class _DecodePrefetcher:
    """Runs decode_read + scan_all for upcoming records on worker thread(s),
    preserving input order, so the main thread only packs planes and
    dispatches device work.

    The reference never lets per-read host work serialize: its N worker
    threads each pull from one locked reader and do decode + feature
    extraction concurrently (sam_batch.hpp:38-54, mod_main.cpp:145-262).
    Here inference lives on the TPU, so the host-side analog is exactly the
    decode + site-scan (numpy + native code that drops the GIL) running
    ahead of the packer.  A feeder thread drains the BAM stream; `workers`
    decode threads tag results with the input index; the consuming iterator
    reorders via a dict, so output order always equals input order (the
    ordered-stream contract, mod_main.cpp:352-362).

    Yields (rec, decoded) pairs for CallEngine.add_read(rec, out, decoded).
    Worker decode/sites time is accumulated in t_decode/t_sites (overlapped
    with the main thread - add to engine timers at end of run for the
    attribution logs).
    """

    _DONE = object()

    def __init__(self, stream, min_read_size: int, workers: int = 1,
                 depth: int = 64):
        import queue
        import threading
        self.min_read_size = min_read_size
        self.workers = max(1, workers)
        self.t_decode = 0.0
        self.t_sites = 0.0
        self._exc = None
        self._inq = queue.Queue(maxsize=depth)
        self._outq = queue.Queue(maxsize=depth + self.workers + 2)
        self._threads = [
            threading.Thread(target=self._feeder, args=(stream,),
                             name="hifimeth-feed", daemon=True)]
        self._threads += [
            threading.Thread(target=self._worker, name=f"hifimeth-decode{i}",
                             daemon=True)
            for i in range(self.workers)]
        for t in self._threads:
            t.start()

    def _feeder(self, stream):
        try:
            for i, (_read_id, rec) in enumerate(stream):
                self._inq.put((i, rec))
        except BaseException as e:  # noqa: BLE001 - re-raised on main
            self._exc = e
        finally:
            for _ in range(self.workers):
                self._inq.put(self._DONE)

    def _worker(self):
        t_dec = t_sit = 0.0
        try:
            while True:
                item = self._inq.get()
                if item is self._DONE:
                    break
                i, rec = item
                read = found = None
                if rec.l_seq >= self.min_read_size:
                    t0 = time.perf_counter()
                    read = decode_read(rec)
                    t1 = time.perf_counter()
                    t_dec += t1 - t0
                    if read is not None:
                        found = sitefind.scan_all(read.seq)
                        t_sit += time.perf_counter() - t1
                self._outq.put((i, rec, (read, found)))
        except BaseException as e:  # noqa: BLE001 - re-raised on main
            self._exc = e
        finally:
            # float += under the GIL per-thread-exit: no finer sync needed
            self.t_decode += t_dec
            self.t_sites += t_sit
            self._outq.put(self._DONE)

    def __iter__(self):
        done = 0
        nxt = 0
        held: dict = {}
        while done < self.workers or held:
            if self._exc is not None:
                raise self._exc
            if done < self.workers:
                item = self._outq.get()
                if item is self._DONE:
                    done += 1
                    continue
                i, rec, decoded = item
                held[i] = (rec, decoded)
            while nxt in held:
                yield held.pop(nxt)
                nxt += 1
        if self._exc is not None:
            raise self._exc


@dataclass
class _PendingRead:
    rec: BamRecord
    fwd_seq: np.ndarray | None = None    # set iff the read was called
    # per-context site slices into the flush's site arrays
    site_slices: dict = field(default_factory=dict)
    extent: int = 0                      # packed end offset (segment-aligned
                                         # flush cut, _split_tail)


class ModelSet:
    """Per-context CNN parameters living on the device."""

    #: process-level cache (see ModelSet.cached)
    _cache: dict = {}

    @classmethod
    def cached(cls, model_dir: str, contexts=CONTEXTS,
               feat_channels: int = 8) -> "ModelSet":
        """Process-level cache of device-resident model weights.

        Constructing a CallEngine device-puts ~114 weight arrays (~3 MB);
        through a remote-TPU tunnel that is real per-run latency, and the
        arrays are immutable once shipped, so repeated engine
        constructions (library use, shard loops, benchmarks) reuse one
        device copy.  The key includes the model files' mtimes, so a
        retrained/re-imported model at the same path reloads; callers
        that need replicated shardings (data-parallel) must copy the set
        rather than mutate it."""
        key = [os.path.realpath(model_dir), tuple(contexts), feat_channels,
               jax.default_backend()]
        for name in [f"{c}.npz" for c in contexts] + ["kmer.txt"]:
            p = os.path.join(model_dir, name)
            key.append(os.path.getmtime(p) if os.path.exists(p) else None)
        key = tuple(key)
        ms = cls._cache.get(key)
        if ms is None:
            ms = cls(model_dir, contexts, feat_channels=feat_channels)
            cls._cache[key] = ms
        return ms

    def __init__(self, model_dir: str, contexts=CONTEXTS,
                 feat_channels: int = 8):
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
            if feat_channels > 8:
                # zero-pad bn0 + conv1 input channels to the widened table
                # width - bit-identical outputs, faster slice fetches
                pad = feat_channels - 8
                params["bn0"]["scale"] = np.pad(params["bn0"]["scale"], (0, pad))
                params["bn0"]["shift"] = np.pad(params["bn0"]["shift"], (0, pad))
                w1 = params["convs"][0]["w"]
                params["convs"][0]["w"] = np.pad(w1, ((0, 0), (0, pad), (0, 0)))
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


def enable_compilation_cache():
    """Persistent XLA compilation cache: the big one-dispatch-per-flush
    programs compile once per (shape-bucket, dtype) ever, not once per
    process.  Especially important when compiles round-trip a remote TPU."""
    cache_dir = os.environ.get(
        "HIFIMETH_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hifimeth_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these flags
        pass


class CallEngine:
    def __init__(self, cfg: CallConfig):
        # Resolve auto/rounded values on a private COPY: constructing an
        # engine must never mutate the caller's config (two engines built
        # from one CallConfig see identical settings; the reference's
        # option struct is likewise read-only after parse,
        # mod_options.cpp:61-134).
        import dataclasses
        cfg = dataclasses.replace(cfg)
        self.cfg = cfg
        if cfg.gather_impl == "auto":
            # pallas group-fetch kernel on real TPUs (10x the XLA slice
            # gather); folded-table slice gather on the CPU backend (pallas
            # would run in the interpreter there)
            cfg.gather_impl = ("folded" if jax.default_backend() == "cpu"
                               else "pallas")
        if cfg.gather_impl not in ("slice", "folded", "pallas", "fused"):
            # fail fast like the reference option parser (mod_options.cpp:61-134);
            # retired experimental impls live in scripts/experimental_gathers.py
            raise ValueError(
                f"unknown gather_impl {cfg.gather_impl!r}; "
                f"choose auto, slice, folded, pallas, or fused")
        # packing/fold/alignment contracts (folded: N % 16, pallas: block
        # base clipping) want a 128-multiple buffer capacity
        cfg.buffer_bases = -(-cfg.buffer_bases // 128) * 128
        if cfg.gather_impl in ("folded", "pallas", "fused") and \
                cfg.feat_channels != 8:
            from ..utils.logging import warn
            warn("--feat-channels is ignored with folded/pallas gather "
                 "(their table layouts are fixed at 8 channels)")
            cfg.feat_channels = 8
        if cfg.conv_impl != "direct" and jax.default_backend() != "cpu":
            from ..utils.logging import warn
            # measured round 3 (all-layers) and round 4 (conv1-only via
            # "auto"): both im2col variants kernel-fault the remote TPU
            # worker through the axon tunnel; they remain CPU-verified
            # experimental paths (docs/BENCHMARKS.md roofline notes)
            warn("conv_impl=%s has crashed the TPU worker on this "
                 "environment; use it for CPU verification only",
                 cfg.conv_impl)
        enable_compilation_cache()
        self.models = ModelSet.cached(cfg.resolve_model_dir(), cfg.contexts,
                                      feat_channels=cfg.feat_channels)
        self.compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                              else jnp.float32)
        self.fused_prep = None
        if cfg.gather_impl == "fused":
            # matmul-layout weights for the fully-fused kernel; loads the
            # raw pytrees again (ModelSet device-puts its copies)
            from ..model.cnn import load_params_npz
            from ..ops.fused import KMER as FUSED_KMER, prepare_fused_params
            if self.models.kmer != FUSED_KMER:
                raise ValueError(
                    f"gather_impl=fused supports kmer={FUSED_KMER} only "
                    f"(model dir declares kmer={self.models.kmer}); use "
                    f"gather_impl=pallas")
            if cfg.compute_dtype == "bfloat16":
                from ..utils.logging import warn
                warn("--dtype bf16 has no effect with gather_impl=fused "
                     "(in-kernel matmuls run default MXU precision)")
            md = cfg.resolve_model_dir()
            self.fused_prep = {
                ctx: prepare_fused_params(
                    load_params_npz(os.path.join(md, f"{ctx}.npz")))
                for ctx in cfg.contexts}
            if cfg.data_parallel:
                from ..utils.logging import warn
                warn("--data-parallel is not supported with gather_impl="
                     "fused yet; running single-device")
                cfg.data_parallel = False
        self.mesh = None
        if cfg.data_parallel and len(jax.local_devices()) > 1:
            import copy
            from ..parallel.mesh import make_mesh, replicated
            self.mesh = make_mesh(n_data=len(jax.local_devices()), n_model=1,
                                  devices=jax.local_devices())
            rep = replicated(self.mesh)
            # shallow-copy the (cached, shared) ModelSet before re-putting
            # the params with replicated shardings - mutating the cached
            # set would leak mesh-sharded arrays into later engines
            self.models = copy.copy(self.models)
            self.models.params = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep), self.models.params)
            log("data-parallel call over %d local devices",
                self.mesh.shape["data"])
        self._reset_buffer()
        #: async-emit machinery: when `sink` is set (run_call points it at
        #: the BAM writer) and cfg.async_emit, finished flushes are resolved
        #: (D2H wait + MM/ML build + write) on a single worker thread, fully
        #: overlapping device_wait+mmbuild with the next flush's host
        #: decode/site-scan/pack.  Record order is preserved: one FIFO
        #: queue, one worker, records sunk in flush order.  Without a sink
        #: (library/list API) emit stays synchronous.
        self.sink = None
        self._dispatch_q = None
        self._resolve_q = None
        self._emit_q = None
        self._dispatch_thread = None
        self._resolve_thread = None
        self._emit_thread = None
        self._emit_exc = None
        self.stats = {ctx: 0 for ctx in cfg.contexts}
        self.stats.update(reads=0, bases=0, called_reads=0)
        #: per-flush pipeline timeline (HIFIMETH_TRACE=1): (t, stage, key)
        self._trace_on = bool(os.environ.get("HIFIMETH_TRACE"))
        self._trace_events: list = []
        self._flush_count = 0
        self.timers = {"decode": 0.0, "sites": 0.0, "pack": 0.0,
                       "device_dispatch": 0.0, "device_wait": 0.0,
                       "mmbuild": 0.0,
                       # device_dispatch sub-phases (not part of the sum)
                       "d_h2d": 0.0, "d_plan": 0.0, "d_enqueue": 0.0}

    def _trace(self, stage: str, key) -> None:
        if self._trace_on:
            self._trace_events.append((time.perf_counter(), stage, id(key)))

    def log_timers(self):
        import sys
        if self._trace_on and self._trace_events:
            ev = sorted(self._trace_events)
            t0 = ev[0][0]
            order: dict = {}
            for _, _, k in ev:
                order.setdefault(k, len(order))
            rows: dict = {}
            for t, stage, k in ev:
                rows.setdefault(order[k], []).append(f"{stage}@{t - t0:.3f}")
            for fid in sorted(rows):
                print(f"[trace flush {fid}] " + " ".join(rows[fid]),
                      file=sys.stderr)
            self._trace_events.clear()
        main = {k: v for k, v in self.timers.items() if not k.startswith("d_")}
        # with async emit, device_wait+mmbuild run on the worker thread and
        # overlap decode/sites/pack - the sum can exceed wall-clock
        total = sum(main.values())
        parts = ", ".join(f"{k}={v:.2f}s" for k, v in main.items())
        # d_h2d = plane-segment ship + featurize enqueue; d_plan = host group
        # planning; d_enqueue = chunk dispatch incl. H2D of the small plan
        # arrays (ADVICE r1: labeled so the attribution is explicit)
        sub = ", ".join(f"{k}={self.timers[k]:.2f}s" for k in
                        ("d_h2d", "d_plan", "d_enqueue"))
        print(f"[engine timers] {parts} (sum {total:.2f}s) [{sub}]",
              file=sys.stderr)

    # -- packing -----------------------------------------------------------
    def _reset_buffer(self):
        cap = self.cfg.buffer_bases
        self._planes = np.zeros((5, cap), dtype=np.uint8)
        # kmer-sized margins keep every window's contiguous slice in-bounds
        # (features/windows.gather_windows_slice contract); seq-plane default
        # 255 makes margins/gaps featurize to zero (dense-layer1 contract)
        self._planes[0].fill(255)
        self._margin = self.models.kmer
        # the inter-read gap must (a) exceed conv K-1 so dense taps never
        # leak across reads (dense-layer1 contract) and (b) reach kmer//2 so
        # a window at a read's edge reads ONLY zero-feature positions - which
        # is what lets the pallas path drop per-site read-bounds masking
        # (gap/margin positions featurize to exactly 0.0, the reference's
        # window zero-padding, eval_kmer_features.cpp:40)
        self._gap = self.models.kmer // 2 + 16
        self._fill = self._margin
        # incremental H2D: the packed buffer ships to the device in
        # cap/H2D_SEGMENTS pieces as reads finalize them, so the ~20 MB/flush
        # transfer (~300 ms through a remote-TPU tunnel) overlaps host
        # decode/site-scan work instead of serializing in front of the
        # flush's device compute (pallas path only; the slice/folded paths
        # ship the whole buffer at flush)
        self._seg_size = cap // self.H2D_SEGMENTS
        self._segments: list = []
        self._reset_flush_state()

    def _reset_flush_state(self):
        """Start a new FLUSH within the current buffer generation
        (fill-through packing): pending reads and site lists reset, but the
        packed planes / shipped segments persist.  Final segments cross the
        H2D link once per generation (early, overlapped with decode) plus
        one small interim tail copy per flush, and the 10 MB plane buffer
        is allocated once per generation instead of once per flush."""
        self._last_flush_fill = self._fill
        self._pending: list[_PendingRead] = []
        self._sites = {ctx: {"centers": [], "strands": [], "rstart": [], "rend": []}
                       for ctx in self.cfg.contexts}

    def add_read(self, rec: BamRecord, out: list, decoded=_UNSET):
        """Queue one record; `out` receives (rec, results-ready) in order.

        `decoded` optionally carries a (DecodedRead|None, scan_all-result|None)
        pair precomputed by a _DecodePrefetcher worker; by default both are
        computed inline here."""
        self.stats["reads"] += 1
        self.stats["bases"] += rec.l_seq
        if rec.l_seq < self.cfg.min_read_size:
            self._pending.append(_PendingRead(rec))
            return
        if decoded is _UNSET:
            t0 = time.perf_counter()
            read = decode_read(rec)
            self.timers["decode"] += time.perf_counter() - t0
            found = None
        else:
            read, found = decoded
        if read is None:
            self._pending.append(_PendingRead(rec))
            return
        if read.size > self.cfg.buffer_bases - 2 * self.models.kmer:
            raise ValueError(
                f"read {rec.qname} ({read.size} bp) exceeds buffer capacity "
                f"{self.cfg.buffer_bases}; raise --buffer-bases")
        # sub-capacity flushes only pay off on the pallas path, where just
        # the FILLED segments ship (slice/folded ship the whole cap-sized
        # buffer per flush, so finer flushes would multiply H2D traffic)
        fb = (self.cfg.flush_bases if self.cfg.gather_impl in ("pallas", "fused")
              else 0) or self.cfg.buffer_bases
        ramp = self.cfg.flush_ramp
        if self.cfg.gather_impl in ("pallas", "fused") and \
                self._flush_count < len(ramp):
            fb = min(fb, ramp[self._flush_count])
        packed = self._fill - self._last_flush_fill
        if self._fill + read.size > self.cfg.buffer_bases - self._margin:
            # buffer generation exhausted: flush whatever is packed/pending
            # (unconditional - pending may hold passthrough reads even when
            # nothing was packed since the last flush), then start a fresh
            # buffer (planes + device segments)
            self.flush(out)
            self._reset_buffer()
        elif packed > 0 and packed + read.size > fb:
            # fill-through flush: dispatch this flush's sites, keep packing
            # into the SAME buffer (already-shipped segments are reused).
            # defer_tail cuts the flush at the last complete H2D segment so
            # no interim partial-segment copy crosses the tunnel
            # (HIFIMETH_NO_SEG_ALIGN=1 restores the round-4 interim-ship
            # behavior for A/B measurement)
            self.flush(out, defer_tail=not os.environ.get(
                "HIFIMETH_NO_SEG_ALIGN"))
        t0 = time.perf_counter()
        start = self._fill
        end = start + read.size
        self._planes[0, start:end] = read.codes
        self._planes[1, start:end] = read.fi
        self._planes[2, start:end] = read.fp
        self._planes[3, start:end] = read.ri
        self._planes[4, start:end] = read.rp
        self._fill = end + self._gap
        if self.cfg.gather_impl in ("pallas", "fused"):
            # stream finalized plane segments to the device now, overlapping
            # the transfer with the remaining host decode/site-scan work
            self._ship_segments(self._fill // self._seg_size)
        self.timers["pack"] += time.perf_counter() - t0

        t0 = time.perf_counter()
        pend = _PendingRead(rec, fwd_seq=read.seq, extent=end)
        # one pass over the read for all contexts (native scanner when built)
        if found is None:
            found = sitefind.scan_all(read.seq)
        for ctx in self.cfg.contexts:
            offs, strands = found[ctx]
            s = self._sites[ctx]
            lo = sum(len(c) for c in s["centers"])
            s["centers"].append(offs.astype(np.int32) + start)
            s["strands"].append(strands)
            s["rstart"].append(np.full(len(offs), start, np.int32))
            s["rend"].append(np.full(len(offs), end, np.int32))
            pend.site_slices[ctx] = (lo, lo + len(offs), offs, strands)
            self.stats[ctx] += len(offs)
        self.timers["sites"] += time.perf_counter() - t0
        self.stats["called_reads"] += 1
        self._pending.append(pend)

    # -- device flush ------------------------------------------------------
    #: allowed per-flush batch counts: ~1.5x steps bound padding waste at
    #: ~33%% worst case / ~15%% average while keeping the compile count small
    #: (programs persist in the XLA compilation cache)
    _BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)

    @classmethod
    def _bucket_batches(cls, nb: int) -> int:
        for b in cls._BUCKETS:
            if b >= nb:
                return b
        return nb

    @classmethod
    def _decompose_batches(cls, nb: int) -> list[int]:
        """Split a flush's batch count into bucket-sized dispatch chunks:
        the largest bucket(s) <= nb, plus the final remainder rounded UP to
        one bucket (52 -> [48, 4]; 255 -> [192, 64], not [192, 48, 12, 2, 1]).
        Each chunk reuses an already-compiled bucket program; vs rounding nb
        up to a single bucket, padding waste drops from the bucket step (up
        to ~33%) to at most the remainder's step, while the tail stays ONE
        dispatch - each dispatch carries a fixed latency cost through remote
        TPU tunnels, so a cascade of small tail chunks costs more than the
        padding it saves."""
        chunks = []
        top = cls._BUCKETS[-1]
        while nb > top:
            chunks.append(top)
            nb -= top
        # single rounded chunk when the padding stays small: each dispatch
        # costs a fixed latency through remote-TPU tunnels (2-10+ ms in slow
        # windows) while <=20% padding costs well under 1 device-ms, so a
        # [6, 1] tail is better dispatched as one 8-bucket chunk (round-5
        # interleaved A/B; the threshold keeps the worst 33% bucket-step
        # pad on the two-chunk path)
        up = cls._bucket_batches(nb)
        if (up - nb) / up <= 0.2:
            chunks.append(up)
            return chunks
        b = max(b for b in cls._BUCKETS if b <= nb)
        chunks.append(b)
        if nb - b:
            chunks.append(cls._bucket_batches(nb - b))
        return chunks

    #: Pallas group-fetch geometry (gather_impl="pallas"):
    #: `GROUP` sites share one (8, BLOCK_LANES) HBM->VMEM block DMA
    GROUP = 32
    BLOCK_LANES = 2048
    #: plane-buffer H2D segmentation (pallas path, see _reset_buffer)
    H2D_SEGMENTS = 8

    def _ship_segments(self, n_seg: int):
        """Enqueue async H2D copies of plane segments [len(shipped), n_seg).
        A segment ships only once everything below it is final (reads pack
        forward-only), so later packing never races the transfer; the
        explicit host copy decouples the staging bytes from self._planes."""
        n_seg = min(n_seg, self.H2D_SEGMENTS)
        seg = self._seg_size
        rep = None
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            rep = replicated(self.mesh)
        while len(self._segments) < n_seg:
            a = len(self._segments) * seg
            piece = np.ascontiguousarray(self._planes[:, a:a + seg])
            self._segments.append(jnp.asarray(piece) if rep is None
                                  else jax.device_put(piece, rep))

    def _call_context_pallas(self, ctx: str, feats_t, s):
        """Group-fetch path: pack groups of GROUP position-sorted sites whose
        window spans fit one block, call call_sites_pallas, unsort the probs
        (ops/gather.group_windows_t).

        The only per-site data shipped to the device is the (ngrp, GROUP)
        window-start lane table; read-edge zero padding comes from the
        packer's zero-feature gaps, not a mask - see call_sites_pallas.
        Host planning is O(n) with no per-site python work: site lists
        concatenate pre-sorted (reads pack at increasing offsets,
        features/sites.py emits per-read offsets ascending), and the
        vectorized plan_groups fast path returns idx=None.

        Reverse-strand sites (CHH) dispatch as a SEPARATE stream through the
        statically-flipped rev=True program: no per-site strand vector ships
        and no flip/permute select runs over the window tensor (which cost
        +62% per CHH batch vs the forward-only program)."""
        from ..features.windows import call_sites_pallas
        from ..ops.gather import CHUNK_LANES, plan_groups

        t_plan = time.perf_counter()
        centers = np.concatenate(s["centers"]) if s["centers"] else np.empty(0, np.int32)
        n = len(centers)
        if n == 0:
            return n, None
        strands = np.concatenate(s["strands"])
        if n > 1 and not np.all(centers[:-1] <= centers[1:]):
            order = np.argsort(centers, kind="stable")
            c_s, st_s = centers[order], strands[order]
        else:
            order = None
            c_s, st_s = centers, strands

        hk = self.models.kmer // 2
        G, BL = self.GROUP, self.BLOCK_LANES
        n_rows = self.cfg.buffer_bases
        # groups per dispatch batch; with a data-parallel mesh each of the
        # n_data devices runs site_batch sites per lax.map step (shard_map
        # over the group axis, call_sites_pallas_dp)
        ndev = self.mesh.shape["data"] if self.mesh is not None else 1
        ngrp = (self.cfg.site_batch // G) * ndev

        if st_s.any():
            streams = [(np.flatnonzero(st_s == 0), False),
                       (np.flatnonzero(st_s == 1), True)]
        else:
            streams = [(None, False)]

        fused = self.cfg.gather_impl == "fused"
        plan = []
        for sel, rev in streams:
            cs = c_s if sel is None else c_s[sel]
            if len(cs) == 0:
                continue
            if fused and rev:
                # fused kernel has no rev program: rev sites extract
                # FORWARD from the pre-reversed table at mirrored starts
                # (ops/fused.reverse_table).  Mirrored starts of ascending
                # centers are descending, so flip the selection to keep
                # the position-sorted-grouping invariant.
                sel = sel[::-1]
                starts = (n_rows - 1 - c_s[sel] - hk).astype(np.int32)
            else:
                starts = (cs - hk).astype(np.int32)
            from ..io import native as nativeio
            fast = nativeio.plan_groups_fast(starts, G, BL,
                                             CHUNK_LANES + 127, n_rows)
            if fast is not None:
                # native single pass returns lane-aligned bases, adjusted
                # rels, and the slot->input map (idx None = no group was
                # span-split, slot order is input order)
                b128, rels, idx = fast
            else:
                bases, rels, idx = plan_groups(
                    starts, G, BL, self.models.kmer, n_rows,
                    extent=CHUNK_LANES + 127)
                b128 = (bases // 128) * 128          # t-kernel lane alignment
                rels = rels + (bases - b128)[:, None]
            ng = len(b128)
            chunks = self._decompose_batches((ng + ngrp - 1) // ngrp)
            nb = sum(chunks)
            pad_g = nb * ngrp - ng
            if pad_g:
                # padded groups fetch from the buffer-start margin (base 0)
                # -> all-zero windows; their prob slots are dropped at emit
                b128 = np.concatenate([b128, np.zeros(pad_g, np.int32)])
                rels = np.concatenate([rels, np.zeros((pad_g, G), np.int32)])
            plan.append((sel, rev, b128.reshape(nb, ngrp),
                         rels.reshape(nb, ngrp, G), idx, ng, chunks))
        self.timers["d_plan"] += time.perf_counter() - t_plan

        t_enq = time.perf_counter()
        # one dispatch per bucket chunk; each reuses a cached program and the
        # chunks run back-to-back on the device stream.  jnp.asarray H2D of
        # the (small) plan arrays is accounted here, not under d_h2d.
        kw = dict(kmer_size=self.models.kmer, compute_dtype=self.compute_dtype,
                  spec=self.models.specs[ctx], conv_impl=self.cfg.conv_impl,
                  group=G, block_lanes=BL,
                  interpret=jax.default_backend() == "cpu")
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..features.windows import call_sites_pallas_dp
            sh2 = NamedSharding(self.mesh, P(None, "data"))
            sh3 = NamedSharding(self.mesh, P(None, "data", None))
        if fused:
            from ..ops.fused import call_sites_fused
            feats_fwd, feats_rev = feats_t
        results = []
        for sel, rev, b128_b, rels_b, idx, ng, chunks in plan:
            probs_parts = []
            o = 0
            for k in chunks:
                if fused:
                    probs_parts.append(call_sites_fused(
                        self.fused_prep[ctx],
                        feats_rev if rev else feats_fwd,
                        jnp.asarray(b128_b[o:o + k]),
                        jnp.asarray(rels_b[o:o + k]),
                        interpret=kw["interpret"]))
                elif self.mesh is not None:
                    probs_parts.append(call_sites_pallas_dp(
                        self.models.params[ctx], feats_t,
                        jax.device_put(b128_b[o:o + k], sh2),
                        jax.device_put(rels_b[o:o + k], sh3), rev,
                        mesh=self.mesh, **kw))
                else:
                    probs_parts.append(call_sites_pallas(
                        self.models.params[ctx], feats_t,
                        jnp.asarray(b128_b[o:o + k]),
                        jnp.asarray(rels_b[o:o + k]), rev, **kw))
                o += k
            results.append((probs_parts, idx, sel, ng))
        self.timers["d_enqueue"] += time.perf_counter() - t_enq
        return n, ("pallas", results, order)

    def _call_context(self, ctx: str, feats, s):
        """Dispatch all of this flush's sites for one context; returns a
        device array future (fetch with np.asarray later to overlap the
        three contexts)."""
        if self.cfg.gather_impl in ("pallas", "fused"):
            # works with or without a data-parallel mesh: multi-chip scales
            # the SAME group-fetch kernel via shard_map, never silently
            # downgrading to the slice gather
            return self._call_context_pallas(ctx, feats, s)
        centers = np.concatenate(s["centers"]) if s["centers"] else np.empty(0, np.int32)
        n = len(centers)
        if n == 0:
            return n, None
        strands = np.concatenate(s["strands"])
        rstart = np.concatenate(s["rstart"])
        rend = np.concatenate(s["rend"])
        bs = self.cfg.site_batch
        kw = dict(kmer_size=self.models.kmer, compute_dtype=self.compute_dtype,
                  spec=self.models.specs[ctx], conv_impl=self.cfg.conv_impl)
        if self.mesh is None:
            kw["gather_impl"] = self.cfg.gather_impl
        if self.mesh is not None:
            nb = self._bucket_batches((n + bs - 1) // bs)
            pad = nb * bs - n
            if pad:
                centers = np.concatenate([centers, np.zeros(pad, np.int32)])
                strands = np.concatenate([strands, np.zeros(pad, np.uint8)])
                rstart = np.concatenate([rstart, np.zeros(pad, np.int32)])
                rend = np.concatenate([rend, np.zeros(pad, np.int32)])
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(None, "data"))
            nb_total = len(centers) // bs
            args = [jax.device_put(a.reshape(nb_total, bs), sh)
                    for a in (centers, strands, rstart, rend)]
            probs = call_sites_grid(self.models.params[ctx], feats, *args,
                                    **kw).reshape(-1)
            return n, probs
        chunks = self._decompose_batches((n + bs - 1) // bs)
        nb = sum(chunks)
        pad = nb * bs - n
        if pad:
            centers = np.concatenate([centers, np.zeros(pad, np.int32)])
            strands = np.concatenate([strands, np.zeros(pad, np.uint8)])
            rstart = np.concatenate([rstart, np.zeros(pad, np.int32)])
            rend = np.concatenate([rend, np.zeros(pad, np.int32)])
        fn = call_sites_batched
        probs_parts = []
        o = 0
        for k in chunks:
            sl = slice(o * bs, (o + k) * bs)
            probs_parts.append(fn(
                self.models.params[ctx], feats,
                jnp.asarray(centers[sl]), jnp.asarray(strands[sl]),
                jnp.asarray(rstart[sl]), jnp.asarray(rend[sl]),
                site_batch=bs, **kw))
            o += k
        return n, probs_parts

    def _dispatch_work(self, work):
        """Device-touching half of a flush: featurize the packed payload and
        dispatch every context's site batches.  `work` is
        (payload_kind, payload, sites) snapshotted by flush(); returns the
        futures dict.  Runs on the dispatch worker in async mode."""
        kind, payload, sites = work
        t_h2d = time.perf_counter()
        if kind == "pallas":
            feats = featurize_planes_t_seg(payload,
                                           cap=self.cfg.buffer_bases)
            if self.cfg.gather_impl == "fused":
                # fused kernels take (fwd, reversed) tables; the reversed
                # one serves reverse-strand (CHH) sites at mirrored starts
                from ..ops.fused import reverse_table
                feats = (feats, reverse_table(feats))
        else:
            planes_dev = jnp.asarray(payload)
            if self.mesh is not None:
                from ..parallel.mesh import replicated
                planes_dev = jax.device_put(payload, replicated(self.mesh))
            if self.cfg.gather_impl == "folded" and self.mesh is None:
                feats = featurize_planes_folded(planes_dev)
            else:
                feats = featurize_planes(planes_dev,
                                         out_channels=self.cfg.feat_channels)
        self.timers["d_h2d"] += time.perf_counter() - t_h2d
        # dispatch all contexts (async); D2H resolution happens on the
        # resolve side of the pipeline
        futures = {ctx: self._call_context(ctx, feats, sites[ctx])
                   for ctx in self.cfg.contexts}
        # NOTE: do NOT request result copies here to "kick" the remote
        # queue - copy_to_host_async on still-queued results hangs the
        # axon tunnel (observed: a warm bench stalling >20 min).  The
        # copies are batched at _resolve time instead.  Why that is safe
        # even at zero pipeline depth (the resolve worker may pick a flush
        # up the instant dispatch enqueues it): the hang mode was copy
        # requests RACING program enqueue on the same thread mid-flush;
        # here the _resolve_q handoff happens only after _dispatch_work
        # has returned, i.e. after every one of the flush's programs is
        # enqueued, so the "all enqueues before any copy" ordering holds
        # regardless of timing.  If a future tunnel regression reproduces
        # the hang anyway, set HIFIMETH_RESOLVE_DELAY_MS to reintroduce a
        # dispatch->resolve delay and bisect (see _resolve).
        return futures

    def flush(self, out: list, defer_tail: bool = False):
        """Snapshot the packed buffer and hand it down the pipeline.

        Async mode (sink set): the snapshot goes to the dispatch worker
        (featurize + plan + enqueue), whose output flows to the resolve
        worker (D2H wait) and then the emit worker (MM/ML build + write) -
        a 4-stage pipeline (pack | dispatch | resolve | emit) so the main
        thread's only per-flush cost is the snapshot + the final segment
        ship.  Sync mode keeps the round-3 behavior: dispatch inline, keep
        one flush in flight, resolve it when the next flush lands.

        `defer_tail` (fill-through flushes only): cut the flush at the last
        COMPLETE H2D segment - reads whose windows need data past that
        boundary carry over to the next flush - so the payload is exactly
        the final segments already shipped and no interim copy of the
        in-progress segment crosses the tunnel (round-5: that re-ship was
        ~1.25 MB x ~7 flushes of redundant H2D per driver run)."""
        t0 = time.perf_counter()
        carry = None
        if (defer_tail and self.cfg.gather_impl in ("pallas", "fused")
                and self._fill > self._last_flush_fill):
            carry = self._split_tail()
            if carry is None:
                # no packed read clears a segment boundary yet: packing
                # continues; the flush re-arms on the next read
                return
        has_packed = any(p.fwd_seq is not None for p in self._pending)
        work = None
        if has_packed or self._pending:
            if has_packed and self.cfg.gather_impl in ("pallas", "fused"):
                # payload = the FINAL segments shipped so far plus (full
                # flushes only) one interim copy of the in-progress segment
                # (windows of this flush's last read reach up to fill-16;
                # the interim piece is NOT recorded in self._segments, so
                # when the segment finishes packing it ships again in final
                # form and later flushes see the complete data)
                self._ship_segments(self._fill // self._seg_size)
                payload = list(self._segments)
                k = len(payload)
                if carry is None and k < self.H2D_SEGMENTS and \
                        self._fill > k * self._seg_size:
                    a = k * self._seg_size
                    piece = np.ascontiguousarray(
                        self._planes[:, a:a + self._seg_size])
                    if self.mesh is not None:
                        from ..parallel.mesh import replicated
                        payload.append(jax.device_put(piece,
                                                      replicated(self.mesh)))
                    else:
                        payload.append(jnp.asarray(piece))
                work = ("pallas", tuple(payload), self._sites)
            elif has_packed:
                work = ("planes", self._planes, self._sites)
        pending = self._pending
        if work is not None:
            self._flush_count += 1
        self._reset_flush_state()
        if carry is not None:
            self._restore_tail(carry)

        if self._async_active():
            self._ensure_pipeline()
            self._check_exc()
            self._trace("flush", pending)
            self._dispatch_q.put((pending, work))
            self.timers["device_dispatch"] += time.perf_counter() - t0
            return

        futures = self._dispatch_work(work) if work is not None else None
        current = (pending, futures)
        self.timers["device_dispatch"] += time.perf_counter() - t0
        prev = getattr(self, "_inflight", None)
        self._inflight = current
        if prev is not None:
            self._emit(prev, out)

    def _split_tail(self):
        """Segment-aligned fill-through cut (see flush(defer_tail=True)).

        Reads pack at increasing offsets, so the pends whose packed data
        reaches past the last complete H2D segment (extent > boundary) are
        exactly a suffix of self._pending; their per-context site arrays
        are the trailing entries of the flush's site lists (one array per
        packed read per context).  A kept read's windows may still poke up
        to kmer//2 past its extent, but only into the inter-read GAP,
        whose features are exactly zero - the same thing
        featurize_planes_t_seg materializes for the unshipped tail - so
        only the read's own data needs to be device-visible.  Splits both
        in place and returns the carried (pends, site-arrays) for
        _restore_tail, or None when no kept packed read remains (caller
        skips the flush)."""
        seg = self._seg_size
        boundary = min(self._fill // seg, self.H2D_SEGMENTS) * seg
        cut = None
        for i, p in enumerate(self._pending):
            if p.fwd_seq is not None and p.extent > boundary:
                cut = i
                break
        if cut is None:
            return ([], None)            # nothing defers: plain flush
        kept = self._pending[:cut]
        if not any(p.fwd_seq is not None for p in kept):
            return None
        deferred = self._pending[cut:]
        n_def = sum(1 for p in deferred if p.fwd_seq is not None)
        arrays = {}
        for ctx in self.cfg.contexts:
            s = self._sites[ctx]
            arrays[ctx] = {}
            for k in s:
                keep_n = len(s[k]) - n_def
                arrays[ctx][k] = s[k][keep_n:]
                del s[k][keep_n:]
        self._pending = kept
        return (deferred, arrays)

    def _restore_tail(self, carry):
        """Re-seed the post-flush state with the reads _split_tail carried:
        their site arrays lead the new flush's lists (offsets stay valid -
        same buffer generation - and stay position-sorted ahead of reads
        packed later), and each pend's site_slices are re-based to the new
        cumulative offsets."""
        pends, arrays = carry
        if not pends:
            return
        cum = {ctx: 0 for ctx in self.cfg.contexts}
        for ctx in self.cfg.contexts:
            s = self._sites[ctx]
            for k in s:
                s[k].extend(arrays[ctx][k])
        for p in pends:
            if p.fwd_seq is None:
                continue
            for ctx in self.cfg.contexts:
                lo, hi, offs, strands = p.site_slices[ctx]
                n = hi - lo
                p.site_slices[ctx] = (cum[ctx], cum[ctx] + n, offs, strands)
                cum[ctx] += n
        self._pending.extend(pends)

    # -- async pipeline ------------------------------------------------------
    def _async_active(self) -> bool:
        return self.cfg.async_emit and self.sink is not None

    def _check_exc(self):
        if self._emit_exc is not None:
            exc, self._emit_exc = self._emit_exc, None
            raise exc

    # backwards-compat alias (round-3 name, used by docs)
    _emit_async_active = _async_active
    _check_emit_exc = _check_exc

    def _ensure_pipeline(self):
        if self._emit_thread is not None:
            return
        import queue
        import threading
        # maxsize 2 per stage bounds live flushes to ~7 across the pipeline;
        # put() backpressure replaces the old synchronous emit stall.
        # HIFIMETH_QUEUE_DEPTH is a tuning knob for remote-tunnel setups
        # where deeper device queues hide scheduling latency (A/B'd round 5:
        # no measurable win at depth 4 on this tunnel, default stays 2)
        depth = int(os.environ.get("HIFIMETH_QUEUE_DEPTH", 2))
        self._dispatch_q = queue.Queue(maxsize=depth)
        self._resolve_q = queue.Queue(maxsize=depth)
        self._emit_q = queue.Queue(maxsize=depth)
        self._dispatch_thread = threading.Thread(
            target=self._dispatch_worker, name="hifimeth-dispatch",
            daemon=True)
        self._resolve_thread = threading.Thread(
            target=self._resolve_worker, name="hifimeth-resolve", daemon=True)
        self._emit_thread = threading.Thread(
            target=self._emit_worker, name="hifimeth-emit", daemon=True)
        self._dispatch_thread.start()
        self._resolve_thread.start()
        self._emit_thread.start()

    def _dispatch_worker(self):
        """Stage 2: featurize + group-plan + enqueue device work."""
        while True:
            item = self._dispatch_q.get()
            try:
                if item is None:
                    self._resolve_q.put(None)
                    return
                pending, work = item
                futures = None
                self._trace("dispatch0", pending)
                if self._emit_exc is None and work is not None:
                    futures = self._dispatch_work(work)
                self._trace("dispatch1", pending)
                self._resolve_q.put((pending, futures))
            except BaseException as e:  # noqa: BLE001 - re-raised on main
                self._emit_exc = e
                self._resolve_q.put((item[0], None))
            finally:
                self._dispatch_q.task_done()

    def _resolve_worker(self):
        """Stage 3: wait for device results (batched D2H)."""
        while True:
            item = self._resolve_q.get()
            try:
                if item is None:
                    self._emit_q.put(None)
                    return
                pending, futures = item
                probs = None
                self._trace("resolve0", pending)
                if self._emit_exc is None:
                    probs = self._resolve(futures)
                self._trace("resolve1", pending)
                self._emit_q.put((pending, probs))
            except BaseException as e:  # noqa: BLE001 - re-raised on main
                self._emit_exc = e
                self._emit_q.put((item[0], None))
            finally:
                self._resolve_q.task_done()

    def _emit_worker(self):
        """Stage 4: MM/ML build + ordered record sink."""
        while True:
            item = self._emit_q.get()
            try:
                if item is None:
                    return
                pending, probs = item
                self._trace("emit0", pending)
                if self._emit_exc is None and probs is not None:
                    local: list = []
                    self._build_emit(pending, probs, local)
                    for rec in local:
                        self.sink(rec)
                self._trace("emit1", pending)
            except BaseException as e:  # noqa: BLE001 - re-raised on main
                self._emit_exc = e
            finally:
                self._emit_q.task_done()

    def finalize(self, out: list):
        """Flush any packed reads and drain the pipeline."""
        self.flush(out)
        if self._emit_thread is not None:
            self._dispatch_q.put(None)
            self._dispatch_thread.join()
            self._resolve_thread.join()
            self._emit_thread.join()
            self._dispatch_thread = None
            self._resolve_thread = None
            self._emit_thread = None
            self._check_exc()
            return
        prev = getattr(self, "_inflight", None)
        self._inflight = None
        if prev is not None:
            self._emit(prev, out)

    @staticmethod
    def _future_parts(f):
        """Device arrays inside one context's dispatch future."""
        if f is None:
            return ()
        if isinstance(f, tuple) and f[0] == "pallas":
            return [p for (parts, _, _, _) in f[1] for p in parts]
        return f if isinstance(f, list) else (f,)

    def _emit(self, inflight, out: list):
        """Sync-path emit: resolve + build in one step (async mode splits
        these across the resolve/emit pipeline stages)."""
        pending, futures = inflight
        self._build_emit(pending, self._resolve(futures), out)

    def _resolve(self, futures):
        """Collect device results into host prob arrays (stage 3)."""
        t0 = time.perf_counter()
        # Diagnostic knob (see the NOTE in _dispatch_work): a forced
        # dispatch->resolve delay to bisect any future recurrence of the
        # copy_to_host_async tunnel hang.  Off (0) in production.
        delay_ms = float(os.environ.get("HIFIMETH_RESOLVE_DELAY_MS", 0))
        if delay_ms > 0:
            time.sleep(delay_ms / 1e3)
        # Start every chunk's D2H copy before blocking on any: through a
        # remote-device tunnel each np.asarray is a full round-trip, so
        # serial fetches of the ~6 per-flush chunk results cost ~6 RTTs
        # (~150 ms) while async-then-collect costs ~1.
        if futures is not None:
            for ctx in self.cfg.contexts:
                for p in self._future_parts(futures[ctx][1]):
                    try:
                        p.copy_to_host_async()
                    except AttributeError:
                        pass
        probs = {}
        for ctx in self.cfg.contexts:
            n, f = futures[ctx] if futures is not None else (0, None)
            if f is None:
                probs[ctx] = np.empty(0, np.uint8)
            elif isinstance(f, tuple) and f[0] == "pallas":
                # group-fetch result, one stream per strand: scatter each
                # stream's slots back through its idx (padded slots duplicate
                # a real site -> same value; idx None means trivial
                # chunking), place into position-sorted order via sel, then
                # unsort (order None = pre-sorted)
                _, streams, order = f
                sorted_probs = np.empty(n, np.uint8)
                for probs_parts, idx, sel, ng in streams:
                    flat = np.concatenate([np.asarray(p) for p in probs_parts])
                    m = n if sel is None else len(sel)
                    if idx is None:
                        sp = flat[:m]
                    else:
                        sp = np.empty(m, np.uint8)
                        sp[idx.ravel()] = flat[:ng * idx.shape[1]]
                    if sel is None:
                        sorted_probs = sp
                    else:
                        sorted_probs[sel] = sp
                if order is None:
                    probs[ctx] = sorted_probs
                else:
                    unsorted = np.empty(n, np.uint8)
                    unsorted[order] = sorted_probs
                    probs[ctx] = unsorted
            elif isinstance(f, list):
                # bucket-chunked dispatches: concatenate the chunk results
                probs[ctx] = np.concatenate(
                    [np.asarray(p) for p in f])[:n]
            else:
                probs[ctx] = np.asarray(f)[:n]
        self.timers["device_wait"] += time.perf_counter() - t0
        return probs

    def _build_emit(self, pending, probs, out: list):
        """MM/ML tag construction + ordered record emission (stage 4)."""
        t0 = time.perf_counter()
        for pend in pending:
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
        self.timers["mmbuild"] += time.perf_counter() - t0


def _print_stats(title: str, contexts, s: dict) -> None:
    """Reference-format stats block (mod_main.cpp:364-407): reads, datasize
    bases, then per-context comma-formatted sample counts (nonzero only)."""
    import sys
    print(title, file=sys.stderr)
    print(f"  ## Reads: {s['reads']}", file=sys.stderr)
    print(f"  ## Bases: {bytes_to_datasize(s['bases'])}", file=sys.stderr)
    for ctx in contexts:
        if s.get(ctx):
            print(f"  ## {ctx} samples: {format_with_commas(s[ctx])}",
                  file=sys.stderr)
    sys.stderr.flush()


def run_call(in_bam: str, out_bam: str, cfg: CallConfig,
             cmdline: str = "hifimeth-tpu call", shard=None) -> dict:
    """End-to-end `call`: returns the stats dict.

    With a multi-process ShardSpec, this process handles only its round-robin
    read blocks and writes an ordered shard BAM (merge with
    `hifimeth-tpu merge-shards`)."""
    from .. import __version__
    from ..parallel.dist import ShardSpec, shard_path, sharded_read_stream

    shard = shard or ShardSpec()
    reader = BamReader(in_bam, threads=cfg.io_threads)
    header = reader.header.with_pg_line("hifimeth-tpu", __version__, cmdline)
    out_path = shard_path(out_bam, shard)
    writer = BamWriter(out_path, header, threads=cfg.io_threads)
    engine = CallEngine(cfg)
    # async emit: the engine's worker thread resolves device results, builds
    # MM/ML tags and writes records while this thread decodes the next flush
    engine.sink = writer.write

    stream = sharded_read_stream(reader, shard)
    nw = cfg.decode_workers
    if nw < 0:
        from ..utils.system import physical_core_count
        nw = min(4, max(1, physical_core_count() - 1))
    if nw > 0:
        prefetch = _DecodePrefetcher(stream, cfg.min_read_size, workers=nw)
        pairs = iter(prefetch)
    else:
        prefetch = None
        pairs = ((rec, _UNSET) for _read_id, rec in stream)

    done: list[BamRecord] = []
    next_log = cfg.read_batch_size
    batch_snap = dict(engine.stats)
    for rec, decoded in pairs:
        engine.add_read(rec, done, decoded=decoded)
        if engine.stats["reads"] >= next_log:
            # per-batch stats in the reference's format (mod_main.cpp:364-379;
            # counters here are at sample-extraction time, matching its
            # per-batch tallies)
            _print_stats("######## Batch stats:", cfg.contexts,
                         {k: engine.stats[k] - batch_snap[k]
                          for k in engine.stats})
            batch_snap = dict(engine.stats)
            log("%10d reads processed", engine.stats["reads"])
            next_log += cfg.read_batch_size
        if done:
            for r in done:
                writer.write(r)
            done.clear()
    engine.finalize(done)
    if prefetch is not None:
        # worker time overlapped the main thread; fold into the attribution
        # timers so decode/sites cost stays visible in the logs
        engine.timers["decode"] += prefetch.t_decode
        engine.timers["sites"] += prefetch.t_sites
    for r in done:
        writer.write(r)
    writer.close()
    reader.close()

    s = engine.stats
    engine.log_timers()
    log("Done.")
    _print_stats("******** Final stats:", cfg.contexts, s)
    if cfg.stats_json:
        import json
        with open(cfg.stats_json, "w") as f:
            json.dump({"stats": {k: int(v) for k, v in s.items()},
                       "timers": engine.timers,
                       "config": {"contexts": list(cfg.contexts),
                                  "compute_dtype": cfg.compute_dtype,
                                  "site_batch": cfg.site_batch}}, f, indent=1)
    return s
