"""End-to-end `call` test: synthetic kinetics BAM -> mod BAM, MM/ML verified
against an independent host-side computation (numpy feature extraction +
model forward)."""
import numpy as np
import pytest

from hifimeth_tpu.constants import FWD, REV
from hifimeth_tpu.engine.call import CallConfig, run_call
from hifimeth_tpu.features import sites as sitefind
from hifimeth_tpu.features.extract import extract_site_features
from hifimeth_tpu.features.read_decode import decode_read, native_fwd_seq
from hifimeth_tpu.io.bam import BamReader
from hifimeth_tpu.io.mmtags import parse_mod_tags_flat
from hifimeth_tpu.model.cnn import (dnamodnet_apply, load_params_npz,
                                    logits_to_scaled_probs)

from util import make_kinetics_read, write_bam


def _expected_calls(rec, models, contexts):
    """Independent per-read call computation via the host golden path."""
    read = decode_read(rec)
    offs_all, strands_all, probs_all = [], [], []
    for ctx in contexts:
        if ctx == "CpG":
            offs = sitefind.cpg_sites(read.seq)
            strands = np.zeros(len(offs), np.uint8)
        elif ctx == "CHG":
            offs = sitefind.chg_sites(read.seq)
            strands = np.zeros(len(offs), np.uint8)
        else:
            offs, strands = sitefind.chh_sites(read.seq)
        if len(offs) == 0:
            continue
        feats = extract_site_features(read, offs, strands)
        logits = dnamodnet_apply(models[ctx], feats)
        probs = np.asarray(logits_to_scaled_probs(logits))
        offs_all.append(offs)
        strands_all.append(strands)
        probs_all.append(probs)
    if not offs_all:
        return (np.empty(0, np.int64),) * 3
    offs = np.concatenate(offs_all)
    strands = np.concatenate(strands_all)
    probs = np.concatenate(probs_all)
    order = np.argsort(offs, kind="stable")
    return offs[order], strands[order], probs[order]


@pytest.mark.parametrize("contexts", [("CpG",), ("CpG", "CHG", "CHH")])
def test_call_end_to_end(tmp_path, contexts):
    rng = np.random.default_rng(42)
    recs = [
        make_kinetics_read(rng, "r0", 1500),
        make_kinetics_read(rng, "r_short", 200),          # below min_read_size
        make_kinetics_read(rng, "r1", 1200, flag=16),     # reverse-flag read
        make_kinetics_read(rng, "r2", 2000, raw_frames=True),  # raw 'S' frames
        make_kinetics_read(rng, "r3", 1100),
    ]
    # read without kinetics -> passthrough
    nok = make_kinetics_read(rng, "r_nokin", 1500)
    for t in ("fi", "ri", "fp", "rp"):
        nok.del_tag(t)
    recs.append(nok)

    in_bam = tmp_path / "in.bam"
    out_bam = tmp_path / "out.bam"
    write_bam(in_bam, recs)

    cfg = CallConfig(contexts=contexts, buffer_bases=1 << 13,  # force multi-flush
                     site_batch=256)
    stats = run_call(str(in_bam), str(out_bam), cfg)
    assert stats["reads"] == len(recs)

    models = {ctx: load_params_npz(f"models/{ctx}.npz") for ctx in contexts}

    out = list(BamReader(out_bam))
    assert [r.qname for r in out] == [r.qname for r in recs]
    for rec_in, rec_out in zip(recs, out):
        fwd_seq = native_fwd_seq(rec_out)
        if rec_in.qname in ("r_short", "r_nokin"):
            assert rec_out.get_tag("MM") is None
            # passthrough keeps kinetics
            if rec_in.qname == "r_short":
                assert rec_out.get_tag("fi") is not None
            continue
        # kinetics stripped on called reads
        assert rec_out.get_tag("fi") is None
        assert rec_out.get_tag("MN")[1] == rec_out.l_seq
        qoffs, strands, codes, probs = parse_mod_tags_flat(rec_out, fwd_seq)
        # MM stores fwd series then rev series; re-sort by qoff to compare
        order = np.argsort(qoffs, kind="stable")
        qoffs, strands, probs = qoffs[order], strands[order], probs[order]

        eoffs, estrands, eprobs = _expected_calls(rec_in, models, contexts)
        # expected strand of the MM series: fwd calls sit on C (series C+m ->
        # strand FWD), rev calls on G (G-m -> REV)
        np.testing.assert_array_equal(qoffs, eoffs)
        np.testing.assert_array_equal(strands, estrands)
        diff = np.abs(probs.astype(int) - eprobs.astype(int))
        assert diff.max() <= 1, f"{rec_in.qname}: max prob diff {diff.max()}"


def test_call_empty_bam(tmp_path):
    in_bam = tmp_path / "in.bam"
    out_bam = tmp_path / "out.bam"
    write_bam(in_bam, [])
    stats = run_call(str(in_bam), str(out_bam), CallConfig(contexts=("CpG",)))
    assert stats["reads"] == 0
    assert list(BamReader(out_bam)) == []


def test_feat_channels_padding_identical(tmp_path):
    """feat_channels=32 (widened slice rows) must give byte-identical tags."""
    rng = np.random.default_rng(77)
    recs = [make_kinetics_read(rng, f"r{i}", 1300) for i in range(4)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)
    a_bam = tmp_path / "a.bam"
    b_bam = tmp_path / "b.bam"
    run_call(str(in_bam), str(a_bam), CallConfig(contexts=("CpG", "CHH"),
                                                 site_batch=256))
    run_call(str(in_bam), str(b_bam), CallConfig(contexts=("CpG", "CHH"),
                                                 site_batch=256,
                                                 feat_channels=32))
    for ra, rb in zip(BamReader(a_bam), BamReader(b_bam)):
        assert ra.get_tag("MM") == rb.get_tag("MM")
        np.testing.assert_array_equal(ra.get_tag("ML")[1][1],
                                      rb.get_tag("ML")[1][1])


def test_unknown_gather_impl_rejected():
    """Retired/unknown gather_impl values must fail fast, never silently
    fall back to another path (reference rejects bad options at parse time,
    mod_options.cpp:61-134)."""
    from hifimeth_tpu.engine.call import CallEngine
    for bad in ("blocked", "u8", "dense", ""):
        with pytest.raises(ValueError, match="gather_impl"):
            CallEngine(CallConfig(gather_impl=bad))


def test_engine_does_not_mutate_config():
    """CallEngine must resolve auto/rounded values on a private copy:
    constructing two engines from one CallConfig yields identical settings
    and the caller's object stays untouched (round-4 verdict #8)."""
    import dataclasses

    cfg = CallConfig(gather_impl="auto", buffer_bases=(1 << 20) + 7,
                     conv_impl="direct")
    snapshot = dataclasses.asdict(cfg)
    from hifimeth_tpu.engine.call import CallEngine
    e1 = CallEngine(cfg)
    assert dataclasses.asdict(cfg) == snapshot, "CallEngine mutated its input"
    e2 = CallEngine(cfg)
    assert dataclasses.asdict(e1.cfg) == dataclasses.asdict(e2.cfg)
    assert e1.cfg.gather_impl in ("slice", "folded", "pallas")
    assert e1.cfg.buffer_bases % 128 == 0


def test_async_emit_matches_sync(tmp_path):
    """The async emit worker (CallConfig.async_emit) must produce records
    identical to and in the same order as the inline path, across many
    small flushes with mixed passthrough/called reads (the reference's
    ordering contract: read-id sort per batch, mod_main.cpp:352-362)."""
    rng = np.random.default_rng(11)
    recs = []
    for i in range(24):
        ln = int(rng.integers(900, 2600))  # some below min_read_size
        recs.append(make_kinetics_read(rng, f"r{i}", ln))
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    outs = {}
    for tag, ae in (("async", True), ("sync", False)):
        out = tmp_path / f"{tag}.bam"
        # tiny buffer + pallas (interpret on CPU) forces many flushes, so
        # several are queued/in-flight in the worker at once
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 13, site_batch=128,
                            gather_impl="pallas", async_emit=ae))
        outs[tag] = [
            (r.qname, r.get_tag("MM"), None if r.get_tag("ML") is None
             else bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
            for r in BamReader(str(out))]
    assert [q for q, _, _ in outs["async"]] == [r.qname for r in recs]
    assert outs["async"] == outs["sync"]


def test_async_emit_propagates_worker_errors(tmp_path):
    """An exception on the emit worker must surface on the caller, not
    hang or get swallowed (fail-fast, hbn_aux.hpp:100-104 spirit)."""
    rng = np.random.default_rng(12)
    recs = [make_kinetics_read(rng, f"r{i}", 1200) for i in range(6)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)
    from hifimeth_tpu.engine.call import CallEngine

    eng = CallEngine(CallConfig(buffer_bases=1 << 13, site_batch=128))
    boom = RuntimeError("sink failed")

    def bad_sink(rec):
        raise boom

    eng.sink = bad_sink
    done = []
    with pytest.raises(RuntimeError, match="sink failed"):
        for rec in BamReader(str(in_bam)):
            eng.add_read(rec, done)
        eng.finalize(done)


def test_flush_bases_smaller_than_read(tmp_path):
    """A read longer than flush_bases must still pack (into an empty
    buffer) rather than flush-loop forever; outputs match the cap-flush
    run."""
    rng = np.random.default_rng(13)
    recs = [make_kinetics_read(rng, f"r{i}", 3000) for i in range(4)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)
    outs = {}
    for tag, fb in (("fine", 1024), ("cap", 0)):
        out = tmp_path / f"{tag}.bam"
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 14, site_batch=128,
                            gather_impl="pallas", flush_bases=fb))
        outs[tag] = [(r.qname, r.get_tag("MM"),
                      bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
                     for r in BamReader(str(out))]
    assert outs["fine"] == outs["cap"] and len(outs["fine"]) == 4


def test_segment_aligned_flush_parity(tmp_path):
    """Fill-through flushes cut at H2D segment boundaries (round 5,
    CallEngine._split_tail): reads whose packed data crosses the last
    complete segment defer to the next flush instead of forcing an interim
    partial-segment ship.  With seg = 2 Ki and ~1.5 Ki reads most flushes
    defer 1-2 reads, and interleaved passthrough reads (short /
    no-kinetics) ride along; output must be bit-identical to the slice
    gather (no flush bookkeeping at all) and preserve input order."""
    rng = np.random.default_rng(99)
    recs = []
    for i in range(40):
        ln = int(rng.integers(1100, 2100))
        recs.append(make_kinetics_read(rng, f"r{i}", ln))
    # passthroughs scattered through the stream: too short + no kinetics
    recs.insert(5, make_kinetics_read(rng, "r_short", 600))
    nokin = make_kinetics_read(rng, "r_nokin", 1400)
    for tag in ("fi", "ri", "fp", "rp"):
        nokin.del_tag(tag)
    recs.insert(23, nokin)
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    outs = {}
    for tag, gi in (("pallas", "pallas"), ("slice", "slice")):
        out = tmp_path / f"{tag}.bam"
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 14, site_batch=128,
                            gather_impl=gi, flush_bases=2048))
        outs[tag] = [
            (r.qname, r.get_tag("MM"), None if r.get_tag("ML") is None
             else bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
            for r in BamReader(str(out))]
    assert [q for q, _, _ in outs["pallas"]] == [r.qname for r in recs]
    assert outs["pallas"] == outs["slice"]


@pytest.mark.parametrize("seed", [11, 29, 61])
def test_segment_aligned_flush_fuzz(tmp_path, seed):
    """Randomized stress of the _split_tail/_restore_tail bookkeeping:
    random read-length mixes (some spanning multiple 2 Ki segments, some
    passthrough) against the slice gather, which has no flush state at
    all.  Same shapes as test_segment_aligned_flush_parity so the jitted
    programs compile once per process."""
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(24):
        kind = rng.integers(0, 10)
        if kind == 0:
            recs.append(make_kinetics_read(rng, f"r{i}", 700))   # passthrough
            continue
        ln = int(rng.integers(1000, 5000))    # up to ~2.5 segments
        r = make_kinetics_read(rng, f"r{i}", ln)
        if kind == 1:
            for tag in ("fi", "ri", "fp", "rp"):
                r.del_tag(tag)                # no-kinetics passthrough
        recs.append(r)
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    outs = {}
    for gi in ("pallas", "slice"):
        out = tmp_path / f"{gi}.bam"
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 14, site_batch=128,
                            gather_impl=gi, flush_bases=2048))
        outs[gi] = [
            (r.qname, r.get_tag("MM"), None if r.get_tag("ML") is None
             else bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
            for r in BamReader(str(out))]
    assert [q for q, _, _ in outs["pallas"]] == [r.qname for r in recs]
    assert outs["pallas"] == outs["slice"]


def test_modelset_cache_reuse_and_mtime_invalidation(tmp_path):
    """ModelSet.cached reuses one device copy of the weights across engine
    constructions (round 5: ~114 device_puts per engine are real tunnel
    latency) but must reload when the model files change on disk - the
    cache key includes the npz/kmer.txt mtimes."""
    import os
    import shutil
    from hifimeth_tpu.engine.call import ModelSet, default_model_dir

    md = tmp_path / "models"
    shutil.copytree(default_model_dir(), md)
    a = ModelSet.cached(str(md), contexts=("CpG",))
    b = ModelSet.cached(str(md), contexts=("CpG",))
    assert a is b
    # different contexts -> different set
    c = ModelSet.cached(str(md), contexts=("CHG",))
    assert c is not a
    # touch the npz: a retrain/import at the same path must reload
    p = md / "CpG.npz"
    os.utime(p, (os.path.getmtime(p) + 10,) * 2)
    d = ModelSet.cached(str(md), contexts=("CpG",))
    assert d is not a


def test_queue_depth_knob_parity(tmp_path, monkeypatch):
    """HIFIMETH_QUEUE_DEPTH (round-5 tunnel-tuning knob) only changes
    pipeline buffering; output must be bit-identical at any depth."""
    rng = np.random.default_rng(7)
    recs = [make_kinetics_read(rng, f"r{i}", 1500) for i in range(12)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)
    outs = {}
    for depth in ("2", "5"):
        monkeypatch.setenv("HIFIMETH_QUEUE_DEPTH", depth)
        out = tmp_path / f"d{depth}.bam"
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 14, site_batch=128,
                            gather_impl="pallas", flush_bases=2048))
        outs[depth] = [(r.qname, r.get_tag("MM"),
                        bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
                       for r in BamReader(str(out))]
    assert outs["2"] == outs["5"] and len(outs["2"]) == 12


def test_decode_prefetcher_order_and_parity(tmp_path):
    """The decode prefetcher (round-4: decode_read + scan_all on worker
    threads, sam_batch.hpp:38-54 analog) must preserve input order and
    produce records identical to the inline decode path, across mixed
    passthrough (short / no-kinetics) and called reads and multiple
    workers."""
    rng = np.random.default_rng(21)
    recs = []
    for i in range(30):
        ln = int(rng.integers(900, 2600))
        recs.append(make_kinetics_read(rng, f"r{i}", ln))
    nokin = make_kinetics_read(rng, "r_nokin", 1500)
    for tag in ("fi", "ri", "fp", "rp"):
        nokin.del_tag(tag)
    recs.insert(7, nokin)
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    outs = {}
    for tag, nw in (("inline", 0), ("w1", 1), ("w3", 3)):
        out = tmp_path / f"{tag}.bam"
        run_call(str(in_bam), str(out),
                 CallConfig(buffer_bases=1 << 13, site_batch=128,
                            gather_impl="pallas", decode_workers=nw))
        outs[tag] = [
            (r.qname, r.get_tag("MM"), None if r.get_tag("ML") is None
             else bytes(np.asarray(r.get_tag("ML")[1][1], np.uint8)))
            for r in BamReader(str(out))]
    assert [q for q, _, _ in outs["w3"]] == [r.qname for r in recs]
    assert outs["inline"] == outs["w1"] == outs["w3"]
    # the no-kinetics read passed through unannotated
    row = outs["w3"][7]
    assert row[0] == "r_nokin" and row[1] is None


def test_batch_stats_logged(tmp_path, capfd):
    """Per-batch stats lines in the reference's format
    (mod_main.cpp:364-379) appear once per read_batch_size reads."""
    rng = np.random.default_rng(22)
    recs = [make_kinetics_read(rng, f"r{i}", 1100) for i in range(9)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)
    run_call(str(in_bam), str(tmp_path / "out.bam"),
             CallConfig(contexts=("CpG",), read_batch_size=4,
                        site_batch=128))
    err = capfd.readouterr().err
    assert err.count("######## Batch stats:") == 2
    assert err.count("  ## Reads: 4") >= 2
    assert "******** Final stats:" in err
    assert "  ## Reads: 9" in err


def test_call_reads_with_n_bases(tmp_path):
    """Reads containing N bases run the full call path: N never matches a
    motif (no sites ON an N) but windows OVERLAPPING Ns must featurize as
    all-zero one-hot (the reference indexes a 4-entry table out of bounds
    there - UB; our pinned divergence, docs/PARITY.md).  The slice and
    pallas-interpret paths must agree exactly."""
    rng = np.random.default_rng(23)
    recs = []
    for i in range(3):
        r = make_kinetics_read(rng, f"n{i}", 1600)
        seq = r.seq_ascii().copy()
        # salt ~5% Ns, incl. a run (real HiFi reads carry occasional Ns)
        idx = rng.choice(len(seq), len(seq) // 20, replace=False)
        seq[idx] = ord("N")
        seq[700:720] = ord("N")
        r.set_seq(seq, qual=r.qual)
        recs.append(r)
    bam = tmp_path / "n.bam"
    write_bam(bam, recs)

    outs = {}
    for impl in ("slice", "folded"):
        out = tmp_path / f"{impl}.bam"
        run_call(str(bam), str(out),
                 CallConfig(site_batch=256, gather_impl=impl), cmdline="t")
        got = list(BamReader(str(out)))
        assert len(got) == 3
        mm = [r.get_tag("MM")[1] if r.get_tag("MM") else None for r in got]
        ml = [np.asarray(r.get_tag("ML")[1][1], int) if r.get_tag("ML")
              else np.empty(0, int) for r in got]
        assert any(m is not None for m in mm), "N-salted reads lost all sites"
        outs[impl] = (mm, np.concatenate(ml))
    assert outs["slice"][0] == outs["folded"][0]
    np.testing.assert_array_equal(outs["slice"][1], outs["folded"][1])
