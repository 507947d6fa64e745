import gzip

import numpy as np
import pytest

from hifimeth_tpu.io.bam import (BamHeader, BamReader, BamRecord, BamWriter,
                                 choose_int_type)
from hifimeth_tpu.io.bgzf import BgzfReader, BgzfWriter


def test_bgzf_roundtrip_and_gzip_compat(tmp_path):
    p = tmp_path / "t.bgzf"
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    w = BgzfWriter(p, threads=3)
    for i in range(0, len(data), 12345):
        w.write(data[i:i + 12345])
    w.close()
    # BGZF is valid multi-member gzip
    assert gzip.open(p, "rb").read() == data
    r = BgzfReader(p, threads=3)
    assert r.read_all() == data
    r.close()


def _mk_record(name="read/1", l=40, flag=4, seed=0):
    rng = np.random.default_rng(seed)
    rec = BamRecord(qname=name, flag=flag)
    seq = rng.choice(list(b"ACGT"), l).astype(np.uint8)
    rec.set_seq(seq, qual=rng.integers(0, 60, l).astype(np.uint8))
    rec.set_tag("fi", "B", ("C", rng.integers(0, 256, l).astype(np.uint8)))
    rec.set_tag("ri", "B", ("C", rng.integers(0, 256, l).astype(np.uint8)))
    rec.set_tag("fp", "B", ("C", rng.integers(0, 256, l).astype(np.uint8)))
    rec.set_tag("rp", "B", ("C", rng.integers(0, 256, l).astype(np.uint8)))
    rec.set_tag("fn", "C", 3)
    rec.set_tag("rn", "C", 4)
    rec.set_tag("RG", "Z", "grp1")
    return rec, seq


def test_bam_record_roundtrip(tmp_path):
    hdr = BamHeader("@HD\tVN:1.6\tSO:unknown\n", [("chr1", 1000), ("chr2", 500)])
    p = tmp_path / "t.bam"
    recs = []
    for i in range(20):
        rec, _ = _mk_record(f"r{i}", l=30 + i, seed=i)
        recs.append(rec)
    with BamWriter(p, hdr) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(p)
    assert rd.header.text == hdr.text
    assert rd.header.refs == hdr.refs
    got = list(rd)
    assert len(got) == len(recs)
    for a, b in zip(recs, got):
        assert a.qname == b.qname
        assert np.array_equal(a.seq_ascii(), b.seq_ascii())
        assert np.array_equal(a.qual, b.qual)
        assert a.flag == b.flag
        for tag in ("fi", "ri", "fp", "rp"):
            ta, tb = a.get_tag(tag), b.get_tag(tag)
            assert ta[0] == tb[0] == "B"
            assert np.array_equal(ta[1][1], tb[1][1])
        assert b.get_tag("RG") == ("Z", "grp1")
        assert b.get_tag("fn") == ("C", 3)


def test_bam_aux_types_roundtrip(tmp_path):
    hdr = BamHeader("", [])
    rec = BamRecord(qname="x", flag=4)
    rec.set_seq(b"ACGTN")
    rec.set_tag("Xa", "A", "Q")
    rec.set_tag("Xc", "c", -5)
    rec.set_tag("XS", "S", 65000)
    rec.set_tag("Xi", "i", -100000)
    rec.set_tag("Xf", "f", 1.5)
    rec.set_tag("XZ", "Z", "hello world")
    rec.set_tag("XB", "B", ("S", np.array([1, 2, 65535], np.uint16)))
    rec.set_tag("Xs", "B", ("f", np.array([0.5, -1.5], np.float32)))
    p = tmp_path / "aux.bam"
    with BamWriter(p, hdr) as w:
        w.write(rec)
    got = next(iter(BamReader(p)))
    assert got.get_tag("Xa") == ("A", "Q")
    assert got.get_tag("Xc") == ("c", -5)
    assert got.get_tag("XS") == ("S", 65000)
    assert got.get_tag("Xi") == ("i", -100000)
    assert got.get_tag("Xf")[1] == pytest.approx(1.5)
    assert got.get_tag("XZ") == ("Z", "hello world")
    sub, arr = got.get_tag("XB")[1]
    assert sub == "S" and np.array_equal(arr, [1, 2, 65535])
    sub, arr = got.get_tag("Xs")[1]
    assert sub == "f" and np.allclose(arr, [0.5, -1.5])
    assert np.array_equal(got.seq_ascii(), np.frombuffer(b"ACGTN", np.uint8))
    assert got.qual is None


def test_cigar_roundtrip(tmp_path):
    rec = BamRecord(qname="m", flag=0, refid=0, pos=100, mapq=60)
    rec.set_seq(b"ACGT" * 10)
    rec.set_cigar_str("5S30M2I1D3M2S")
    ops, lens = rec.cigar_ops()
    assert "".join("MIDNSHP=X"[o] for o in ops) == "SMIDMS"
    assert list(lens) == [5, 30, 2, 1, 3, 2]
    p = tmp_path / "c.bam"
    with BamWriter(p, BamHeader("", [("chr1", 10000)])) as w:
        w.write(rec)
    got = next(iter(BamReader(p)))
    assert np.array_equal(got.cigar, rec.cigar)
    assert got.pos == 100 and got.refid == 0


def test_choose_int_type():
    assert choose_int_type(200) == "C"
    assert choose_int_type(-5) == "c"
    assert choose_int_type(40000) == "S"
    assert choose_int_type(-300) == "s"
    assert choose_int_type(1 << 20) == "I"
    assert choose_int_type(-(1 << 20)) == "i"


def test_header_sort_order():
    hdr = BamHeader("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c\tLN:5\n", [("c", 5)])
    assert hdr.sort_order() == "coordinate"
    hdr2 = hdr.with_pg_line("hifimeth-tpu", "0.1", "call a b")
    assert "@PG\tID:hifimeth-tpu" in hdr2.text
    assert hdr2.sort_order() == "coordinate"


def test_bgzf_python_fallback(tmp_path, monkeypatch):
    """The pure-Python BGZF paths must work when the native lib is absent."""
    import hifimeth_tpu.io.native as native
    monkeypatch.setattr(native, "_LIB", False)
    assert not native.available()
    p = tmp_path / "py.bgzf"
    data = b"fallback path " * 50000
    w = BgzfWriter(p, threads=2)
    w.write(data)
    w.close()
    assert w._native is None
    r = BgzfReader(p, threads=2)
    assert r._native is None
    assert r.read_all() == data
    r.close()
