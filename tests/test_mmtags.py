import numpy as np
import pytest

from hifimeth_tpu.constants import FWD, REV
from hifimeth_tpu.features.read_decode import native_fwd_seq
from hifimeth_tpu.io.bam import BamRecord
from hifimeth_tpu.io.mmtags import (ModTagError, build_mod_tags,
                                    parse_mod_tags, parse_mod_tags_flat)


def _record_with_seq(seq: bytes, flag=4):
    rec = BamRecord(qname="r", flag=flag)
    rec.set_seq(seq)
    return rec


def test_mm_delta_encoding_exact():
    #        0123456789012345
    seq = b"ACGCCGTACGGATCGA"
    # C positions: 1,3,4,8,13 ; G positions: 2,5,9,10,14
    rec = _record_with_seq(seq)
    fwd_seq = native_fwd_seq(rec)
    build_mod_tags(rec, fwd_seq,
                   np.array([3, 13]), np.array([200, 10]),
                   np.array([2, 14]), np.array([99, 100]))
    # call@3 skips C@1 (delta 1); call@13 skips C@4,C@8 (delta 2)
    # call@2 skips none; call@14 skips G@5,9,10 (delta 3)
    assert rec.get_tag("MM")[1] == "C+m,1,2;G-m,0,3;"
    sub, ml = rec.get_tag("ML")[1]
    assert sub == "C" and list(ml) == [200, 10, 99, 100]
    assert rec.get_tag("MN") == ("C", len(seq))


def test_mm_roundtrip_random():
    rng = np.random.default_rng(7)
    for trial in range(20):
        L = int(rng.integers(50, 400))
        seq = rng.choice(list(b"ACGT"), L).astype(np.uint8)
        rec = _record_with_seq(seq.tobytes())
        fwd_seq = native_fwd_seq(rec)
        cpos = np.flatnonzero(fwd_seq == ord("C"))
        gpos = np.flatnonzero(fwd_seq == ord("G"))
        nf = int(rng.integers(0, len(cpos) + 1)) if len(cpos) else 0
        nr = int(rng.integers(0, len(gpos) + 1)) if len(gpos) else 0
        fq = np.sort(rng.choice(cpos, nf, replace=False)) if nf else np.empty(0, np.int64)
        rq = np.sort(rng.choice(gpos, nr, replace=False)) if nr else np.empty(0, np.int64)
        fp = rng.integers(0, 256, nf).astype(np.uint8)
        rp = rng.integers(0, 256, nr).astype(np.uint8)
        build_mod_tags(rec, fwd_seq, fq, fp, rq, rp)
        if nf == 0 and nr == 0:
            assert rec.get_tag("MM") is None
            continue
        series = parse_mod_tags(rec, fwd_seq)
        assert len(series) == 2
        s_f, s_r = series
        assert s_f.unmod_base == "C" and s_f.strand == FWD and s_f.codes == "m"
        assert s_r.unmod_base == "G" and s_r.strand == REV and s_r.codes == "m"
        assert np.array_equal(s_f.qoffs, fq)
        assert np.array_equal(s_r.qoffs, rq)
        assert np.array_equal(s_f.probs[:, 0], fp)
        assert np.array_equal(s_r.probs[:, 0], rp)


def test_mm_roundtrip_reverse_flag_read():
    # a flag-0x10 record stores the reverse complement; MM/ML are written
    # against the native-forward strand (build_mod_bam.cpp:139,157)
    fwd = np.frombuffer(b"AACGTCCGGA", np.uint8)
    # stored = revcomp(fwd)
    comp = dict(zip(b"ACGT", b"TGCA"))
    stored = bytes(comp[b] for b in fwd[::-1])
    rec = _record_with_seq(stored, flag=16)
    fwd_seq = native_fwd_seq(rec)
    assert fwd_seq.tobytes() == b"AACGTCCGGA"
    build_mod_tags(rec, fwd_seq, np.array([5]), np.array([42]),
                   np.array([8]), np.array([77]))
    qoffs, strands, codes, probs = parse_mod_tags_flat(rec, fwd_seq)
    assert list(qoffs) == [5, 8]
    assert list(strands) == [FWD, REV]
    assert list(probs) == [42, 77]


def test_parser_tolerates_general_syntax():
    seq = b"CCCCTTTT"
    rec = _record_with_seq(seq)
    fwd_seq = native_fwd_seq(rec)
    # '?' flag, multi-code series, ChEBI code series
    rec.set_tag("MM", "Z", "C+mh?,0,1;T-16964,2;")
    rec.set_tag("ML", "B", ("C", np.array([10, 20, 30, 40, 50], np.uint8)))
    series = parse_mod_tags(rec, fwd_seq)
    assert series[0].codes == "mh"
    assert np.array_equal(series[0].qoffs, [0, 2])
    assert np.array_equal(series[0].probs, [[10, 20], [30, 40]])
    assert series[1].codes == "g"          # ChEBI 16964 -> g
    assert series[1].unmod_base == "T"
    assert np.array_equal(series[1].qoffs, [6])
    assert np.array_equal(series[1].probs, [[50]])


def test_parser_rejects_bad_input():
    seq = b"CCCC"
    rec = _record_with_seq(seq)
    fwd_seq = native_fwd_seq(rec)
    rec.set_tag("ML", "B", ("C", np.array([1], np.uint8)))
    rec.set_tag("MM", "Z", "C+m,0")      # missing trailing ';'
    with pytest.raises(ModTagError):
        parse_mod_tags(rec, fwd_seq)
    rec.set_tag("MM", "Z", "C+g,0;")     # invalid base/code combo
    with pytest.raises(ModTagError):
        parse_mod_tags(rec, fwd_seq)
    rec.set_tag("MM", "Z", "C+m,9;")     # walks past the end
    with pytest.raises(ModTagError):
        parse_mod_tags(rec, fwd_seq)


def test_parser_returns_empty_without_tags():
    rec = _record_with_seq(b"ACGT")
    fwd_seq = native_fwd_seq(rec)
    assert parse_mod_tags(rec, fwd_seq) == []
    rec.set_tag("ML", "B", ("C", np.empty(0, np.uint8)))
    assert parse_mod_tags(rec, fwd_seq) == []


def test_kinetics_tags_stripped():
    rec = _record_with_seq(b"CCGG")
    for t in ("fi", "ri", "fp", "rp"):
        rec.set_tag(t, "B", ("C", np.zeros(4, np.uint8)))
    fwd_seq = native_fwd_seq(rec)
    build_mod_tags(rec, fwd_seq, np.array([0]), np.array([1]),
                   np.empty(0, np.int64), np.empty(0, np.uint8))
    for t in ("fi", "ri", "fp", "rp"):
        assert rec.get_tag(t) is None
    # MM still contains both series headers even with zero rev calls
    assert rec.get_tag("MM")[1] == "C+m,0;G-m;"

    rec2 = _record_with_seq(b"CCGG")
    for t in ("fi", "ri", "fp", "rp"):
        rec2.set_tag(t, "B", ("C", np.zeros(4, np.uint8)))
    build_mod_tags(rec2, native_fwd_seq(rec2), np.array([0]), np.array([1]),
                   np.empty(0, np.int64), np.empty(0, np.uint8),
                   keep_kinetics=True)
    for t in ("fi", "ri", "fp", "rp"):
        assert rec2.get_tag(t) is not None
