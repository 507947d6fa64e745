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


def _sam_line(rec, header):
    """Serialize one BamRecord to a SAM text line (test helper, written
    independently of SamTextReader)."""
    import numpy as np
    rname = "*" if rec.refid < 0 else header.refs[rec.refid][0]
    cig = "*" if len(rec.cigar) == 0 else "".join(
        f"{int(ln)}{'MIDNSHP=X'[int(op)]}"
        for op, ln in zip(*rec.cigar_ops()))
    seq = rec.seq_ascii().tobytes().decode() or "*"
    qual = "*" if rec.qual is None else "".join(
        chr(int(q) + 33) for q in rec.qual)
    cols = [rec.qname, str(rec.flag), rname, str(rec.pos + 1), str(rec.mapq),
            cig, "*", "0", "0", seq, qual]
    for tag, ty, val in rec.tags:
        if ty in "cCsSiI":
            cols.append(f"{tag}:i:{int(val)}")
        elif ty == "B":
            sub, arr = val
            cols.append(f"{tag}:B:{sub}," + ",".join(str(int(x)) for x in arr))
        else:
            cols.append(f"{tag}:{ty}:{val}")
    return "\t".join(cols)


def test_cram_input_rejected_clearly(tmp_path):
    """A CRAM file must be detected by magic and rejected with a conversion
    hint, not fail with a confusing SAM parse error (the reference reads
    CRAM through htslib's sam_open auto-detection, sam_batch.hpp:12-23)."""
    import pytest

    from hifimeth_tpu.io.bam import BamFormatError, BamReader

    cram = tmp_path / "x.cram"
    cram.write_bytes(b"CRAM\x03\x00" + b"\x00" * 64)
    with pytest.raises(BamFormatError, match="CRAM.*samtools view"):
        BamReader(str(cram))


def test_sam_text_input_roundtrip(tmp_path):
    """SAM text (plain and gzipped) parses into records identical to the
    BAM path - the reference accepts SAM via htslib auto-detection
    (sam_batch.hpp:12-23)."""
    import gzip

    import numpy as np

    from util import make_kinetics_read, write_bam

    rng = np.random.default_rng(44)
    recs = [make_kinetics_read(rng, f"r{i}", 500) for i in range(4)]
    recs[2].flag = 16
    recs[2].refid = 0
    recs[2].pos = 99
    recs[2].mapq = 60
    recs[2].set_cigar_str("300M1D100M2I98M")
    bam = tmp_path / "x.bam"
    from hifimeth_tpu.io.bam import BamReader
    hdr = write_bam(bam, recs, refs=[("chr9", 5000)],
                    text="@HD\tVN:1.6\tSO:unknown\n@SQ\tSN:chr9\tLN:5000\n")

    lines = ["@HD\tVN:1.6\tSO:unknown", "@SQ\tSN:chr9\tLN:5000"]
    lines += [_sam_line(r, hdr) for r in recs]
    sam_text = "\n".join(lines) + "\n"
    sam = tmp_path / "x.sam"
    sam.write_text(sam_text)
    samgz = tmp_path / "x.sam.gz"
    samgz.write_bytes(gzip.compress(sam_text.encode()))

    want = list(BamReader(str(bam)))
    for src in (sam, samgz):
        reader = BamReader(str(src))
        assert reader.header.refs == [("chr9", 5000)]
        assert reader.header.sort_order() == "unknown"
        got = list(reader)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            assert (a.qname, a.flag, a.refid, a.pos, a.mapq) == \
                   (b.qname, b.flag, b.refid, b.pos, b.mapq)
            np.testing.assert_array_equal(a.seq_ascii(), b.seq_ascii())
            np.testing.assert_array_equal(a.cigar, b.cigar)
            for t in ("fi", "ri", "fp", "rp"):
                np.testing.assert_array_equal(a.get_tag(t)[1][1],
                                              b.get_tag(t)[1][1])
        reader.close()


def test_sam_input_through_call(tmp_path):
    """`call` on a SAM text input produces the same MM/ML as the BAM."""
    import numpy as np

    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader
    from util import make_kinetics_read, write_bam

    rng = np.random.default_rng(45)
    recs = [make_kinetics_read(rng, f"r{i}", 1200) for i in range(3)]
    bam = tmp_path / "in.bam"
    hdr = write_bam(bam, recs)
    sam = tmp_path / "in.sam"
    sam.write_text("@HD\tVN:1.6\tSO:unknown\n"
                   + "\n".join(_sam_line(r, hdr) for r in recs) + "\n")

    outs = {}
    for tag, src in (("bam", bam), ("sam", sam)):
        out = tmp_path / f"{tag}.out.bam"
        run_call(str(src), str(out),
                 CallConfig(contexts=("CpG",), site_batch=128,
                            buffer_bases=1 << 13))
        outs[tag] = [(r.qname, r.get_tag("MM")) for r in BamReader(str(out))]
    assert outs["bam"] == outs["sam"]


def test_sam_input_through_pileup(tmp_path):
    """pileup on a SAM-text mod input (next_raw serialization path) produces
    BEDs byte-identical to the BAM input."""
    import numpy as np

    from hifimeth_tpu.io.bam import BamReader
    from hifimeth_tpu.quant.pileup import run_pileup

    import pathlib
    import sys as _sys
    _sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    from bench import make_mapped_mod_bam

    fa = tmp_path / "r.fa"
    bam = tmp_path / "m.bam"
    make_mapped_mod_bam(str(fa), str(bam), 12, 3000, 40000)
    reader = BamReader(str(bam))
    hdr = reader.header
    lines = [ln for ln in hdr.text.rstrip("\n").split("\n")]
    # ensure an @SQ line exists for the SAM header refs
    if not any(ln.startswith("@SQ") for ln in lines):
        lines.append(f"@SQ\tSN:{hdr.refs[0][0]}\tLN:{hdr.refs[0][1]}")
    for rec in reader:
        lines.append(_sam_line(rec, hdr))
    reader.close()
    sam = tmp_path / "m.sam"
    sam.write_text("\n".join(lines) + "\n")

    run_pileup(str(fa), str(bam), str(tmp_path / "a"), spill_dir=str(tmp_path))
    run_pileup(str(fa), str(sam), str(tmp_path / "b"), spill_dir=str(tmp_path))
    # sharded pass 1 over the SAM input exercises the direct-record
    # ownership-skip branch of _pass1_stream (round-5 ADVICE fix)
    from hifimeth_tpu.quant.pileup import run_pileup_parallel
    run_pileup_parallel(str(fa), str(sam), str(tmp_path / "c"), workers=2,
                        spill_dir=str(tmp_path))
    for ctx in ("CpG", "CHG", "CHH"):
        a = (tmp_path / f"a.{ctx}.cov.bed").read_bytes()
        b = (tmp_path / f"b.{ctx}.cov.bed").read_bytes()
        c = (tmp_path / f"c.{ctx}.cov.bed").read_bytes()
        assert a == b == c and len(a) > 0
