"""Independent-oracle fuzz tests for the I/O parity layer (round-4 verdict).

The golden corpus (tests/test_golden.py) pins regressions but is a
self-oracle: a systematic error shared by the writer and the parser would be
invisible to it.  These seeded fuzz tests pit the production code against
tiny brute-force re-implementations written directly from the reference
sources, sharing NO code with the production path:

 - BamRecord serialization: random records must be a byte fixed-point of
   writer -> parser -> writer (and survive a BamWriter/BamReader file trip).
 - MM/ML tags: the production writer's output is decoded by an independent
   per-character delta-walker (style of bam_mod_parser.cpp:197-228) and must
   reproduce the original calls; independently-constructed general MM
   strings (multi-code, ChEBI, ./? flags) must parse to their ground truth.
 - CIGAR expansion: expand_alignment vs a naive per-column expander written
   from cigar_to_alignment (bam_info.cpp:262-371), including the reference's
   clip quirks, with every column asserted against the raw sequences
   (the reference's runtime self-check, bam_info.cpp:399-416).
"""
from __future__ import annotations

import numpy as np
import pytest

from hifimeth_tpu.io.bam import BamHeader, BamReader, BamRecord, BamWriter

# ---------------------------------------------------------------------------
# A. BamRecord writer -> parser -> writer byte fixed-point


def _random_record(rng) -> BamRecord:
    rec = BamRecord(qname="q" + "".join(
        chr(int(c)) for c in rng.integers(0x21, 0x7E, rng.integers(1, 30))))
    mapped = rng.random() < 0.5
    L = int(rng.integers(1, 400))
    seq = rng.choice(list(b"ACGTN"), L, p=[.24, .25, .25, .24, .02]).astype(np.uint8)
    if rng.random() < 0.15:
        rec.set_seq(seq)                          # qual absent (0xff fill)
    else:
        rec.set_seq(seq, qual=rng.integers(0, 94, L).astype(np.uint8))
    if mapped:
        rec.flag = int(rng.choice([0, 16, 0x100, 0x800]))
        rec.refid = 0
        rec.pos = int(rng.integers(0, 1 << 20))
        rec.mapq = int(rng.integers(0, 61))
        nm = int(rng.integers(1, L + 1))
        rec.set_cigar_str(f"{nm}M{L - nm}S" if nm < L else f"{L}M")
    else:
        rec.flag = 4
    ntags = int(rng.integers(0, 6))
    used = set()
    for _ in range(ntags):
        tag = "".join(chr(int(c)) for c in rng.integers(65, 91, 2))
        if tag in used or tag in ("MM", "ML", "MN"):
            continue
        used.add(tag)
        kind = rng.integers(0, 5)
        if kind == 0:                             # int scalar, all widths
            ty = str(rng.choice(list("cCsSiI")))
            lohi = {"c": (-128, 128), "C": (0, 256),
                    "s": (-(1 << 15), 1 << 15), "S": (0, 1 << 16),
                    "i": (-(1 << 31), 1 << 31), "I": (0, 1 << 32)}[ty]
            rec.set_tag(tag, ty, int(rng.integers(*lohi)))
        elif kind == 1:                           # float
            rec.set_tag(tag, "f", float(np.float32(rng.normal())))
        elif kind == 2:                           # printable string
            s = "".join(chr(int(c)) for c in rng.integers(0x20, 0x7E,
                                                          rng.integers(0, 20)))
            rec.set_tag(tag, "Z", s)
        elif kind == 3:                           # single char
            rec.set_tag(tag, "A", chr(int(rng.integers(0x21, 0x7E))))
        else:                                     # B array, every subtype
            sub = str(rng.choice(list("cCsSiIf")))
            n = int(rng.integers(0, 40))
            if sub == "f":
                arr = rng.normal(size=n).astype(np.float32)
            else:
                dt = {"c": np.int8, "C": np.uint8, "s": np.int16,
                      "S": np.uint16, "i": np.int32, "I": np.uint32}[sub]
                info = np.iinfo(dt)
                arr = rng.integers(info.min, int(info.max) + 1, n).astype(dt)
            rec.set_tag(tag, "B", (sub, arr))
    return rec


def test_fuzz_record_roundtrip_fixed_point(tmp_path):
    rng = np.random.default_rng(1234)
    recs = []
    for _ in range(1000):
        rec = _random_record(rng)
        b1 = rec.to_bytes()
        rec2 = BamRecord.from_bytes(memoryview(b1)[4:])
        b2 = rec2.to_bytes()
        assert b1 == b2, (rec.qname, rec.tags)
        recs.append(rec)
    # file trip: BamWriter -> BamReader reproduces the same record bytes
    path = tmp_path / "fuzz.bam"
    hdr = BamHeader("@HD\tVN:1.6\tSO:unknown\n", [("chr1", 1 << 21)])
    with BamWriter(path, hdr) as w:
        for r in recs:
            w.write(r)
    got = [r.to_bytes() for r in BamReader(str(path))]
    assert len(got) == len(recs)
    for a, r in zip(got, recs):
        assert a == r.to_bytes()


# ---------------------------------------------------------------------------
# B. MM/ML: independent per-character delta-walker oracle
#
# Written straight from bam_mod_parser.cpp:197-228 semantics: scan the
# native-forward read base by base; for each delta skip that many
# occurrences of the series' unmod base, the next occurrence is the call.
# No numpy, no shared helpers.

_CHEBI = {27551: "m", 76792: "h", 76794: "f", 76793: "c", 16964: "g",
          80961: "e", 17477: "b", 28871: "a", 44605: "o", 18107: "n"}


def naive_parse_mm(mm: str, ml: list[int], fwd_seq: bytes):
    """Brute-force MM/ML decode -> list of (qoff, strand, code, prob)."""
    assert mm.endswith(";")
    out = []
    pi = 0
    for series in (s + ";" for s in mm.split(";")[:-1]):
        base = series[0]
        strand = 0 if series[1] == "+" else 1
        assert series[1] in "+-"
        i = 2
        codes = ""
        if series[i].isdigit():
            j = i
            while series[j].isdigit():
                j += 1
            codes = _CHEBI[int(series[i:j])]
            i = j
        else:
            while series[i] not in ",;":
                if series[i] not in ".?":
                    codes += series[i]
                i += 1
        deltas = []
        if series[i] == ",":
            for tok in series[i + 1:-1].split(","):
                deltas.append(int(tok))
        # the walk
        scan = 0
        for d in deltas:
            skipped = 0
            qoff = None
            while scan < len(fwd_seq):
                if chr(fwd_seq[scan]) == base:
                    if skipped == d:
                        qoff = scan
                        scan += 1
                        break
                    skipped += 1
                scan += 1
            assert qoff is not None, "delta walked past the read"
            for c in codes:
                out.append((qoff, strand, c, ml[pi]))
                pi += 1
    assert pi == len(ml)
    return out


def test_fuzz_writer_against_naive_walker():
    """Production build_mod_tags output decoded by the independent walker
    must reproduce the original calls exactly (1k random reads)."""
    from hifimeth_tpu.io.mmtags import build_mod_tags

    rng = np.random.default_rng(77)
    for case in range(1000):
        L = int(rng.integers(10, 600))
        seq = rng.choice(list(b"ACGTN"), L, p=[.3, .2, .2, .28, .02]).astype(np.uint8)
        cpos = np.flatnonzero(seq == ord("C"))
        gpos = np.flatnonzero(seq == ord("G"))
        fq = np.sort(rng.choice(cpos, rng.integers(0, len(cpos) + 1),
                                replace=False)) if len(cpos) else np.empty(0, np.int64)
        rq = np.sort(rng.choice(gpos, rng.integers(0, len(gpos) + 1),
                                replace=False)) if len(gpos) else np.empty(0, np.int64)
        fp = rng.integers(0, 256, len(fq)).astype(np.uint8)
        rp = rng.integers(0, 256, len(rq)).astype(np.uint8)
        rec = BamRecord(qname=f"f{case}", flag=4)
        rec.set_seq(seq)
        build_mod_tags(rec, seq, fq, fp, rq, rp)
        if len(fq) == 0 and len(rq) == 0:
            assert rec.get_tag("MM") is None
            continue
        mm = rec.get_tag("MM")[1]
        ml = [int(x) for x in rec.get_tag("ML")[1][1]]
        got = naive_parse_mm(mm, ml, seq.tobytes())
        want = ([(int(q), 0, "m", int(p)) for q, p in zip(fq, fp)]
                + [(int(q), 1, "m", int(p)) for q, p in zip(rq, rp)])
        assert got == want, f"case {case}"


def test_fuzz_parser_against_independent_construction():
    """General MM strings (multi-code, ChEBI, ./? flags, multiple series)
    built by an independent construction must parse to their ground truth
    through the production parser (1k random reads)."""
    from hifimeth_tpu.io.mmtags import parse_mod_tags_flat

    rng = np.random.default_rng(78)
    chebi_of = {v: k for k, v in _CHEBI.items()}
    for case in range(1000):
        L = int(rng.integers(20, 400))
        seq = rng.choice(list(b"ACGTN"), L, p=[.27, .22, .22, .27, .02]).astype(np.uint8)
        fwd = seq.tobytes().decode()
        n_series = int(rng.integers(1, 4))
        mm_parts = []
        ml: list[int] = []
        want = []
        for _ in range(n_series):
            base, strand, codes = [
                ("C", "+", "m"), ("G", "-", "m"), ("C", "+", "mh"),
                ("T", "+", "g"), ("A", "-", "a"), ("G", "-", "o"),
            ][int(rng.integers(0, 6))]
            pos = [i for i, ch in enumerate(fwd) if ch == base]
            k = int(rng.integers(0, min(len(pos), 20) + 1))
            picks = sorted(rng.choice(pos, k, replace=False).tolist()) if k else []
            # independent delta construction: rank differences via loop
            deltas = []
            prev_rank = -1
            for q in picks:
                rank = sum(1 for p in pos if p < q)
                deltas.append(rank - prev_rank - 1)
                prev_rank = rank
            # ChEBI form requires a ',' right after the number (the
            # reference aborts otherwise, bam_mod_parser.cpp:44-47, and the
            # production parser matches), so only use it with >=1 delta
            use_chebi = len(codes) == 1 and deltas and rng.random() < 0.3
            head = f"{base}{strand}"
            head += str(chebi_of[codes]) if use_chebi else codes
            if not use_chebi and rng.random() < 0.3:
                head += rng.choice([".", "?"])
            mm_parts.append(head + "".join(f",{d}" for d in deltas) + ";")
            s = 0 if strand == "+" else 1
            for q in picks:                       # pos-major prob layout
                for c in codes:
                    p = int(rng.integers(0, 256))
                    ml.append(p)
                    want.append((q, s, c, p))
        rec = BamRecord(qname=f"p{case}", flag=4)
        rec.set_seq(seq)
        rec.set_tag("MM", "Z", "".join(mm_parts))
        rec.set_tag("ML", "B", ("C", np.asarray(ml, np.uint8)))
        if not ml:
            continue                              # empty ML -> parser returns []
        qoffs, strands, codes_a, probs = parse_mod_tags_flat(rec, seq)
        got = sorted(zip(qoffs.tolist(), strands.tolist(),
                         [chr(c) for c in codes_a], probs.tolist()))
        assert got == sorted(want), f"case {case}"


# ---------------------------------------------------------------------------
# C. CIGAR expansion vs a naive per-column expander + column self-check

_GAP = ord("-")


def naive_expand(query: bytes, subject: bytes, pos: int, cigar: list):
    """Per-column expansion copied from cigar_to_alignment
    (bam_info.cpp:262-371), including its clip handling: only the FIRST
    op is special-cased (S sets qb, H skipped); later S/H/P emit nothing
    and consume nothing."""
    qas, sas, qpos, spos = [], [], [], []
    qb = 0
    opi = 0
    if cigar and cigar[0][0] == "S":
        qb = cigar[0][1]
        opi = 1
    elif cigar and cigar[0][0] == "H":
        opi = 1
    qi = qb - 1
    si = pos - 1
    for op, num in cigar[opi:]:
        if op in "M=X":
            for _ in range(num):
                qi += 1
                si += 1
                qas.append(query[qi])
                sas.append(subject[si])
                qpos.append(qi)
                spos.append(si)
        elif op == "I":
            for _ in range(num):
                qi += 1
                qas.append(query[qi])
                sas.append(_GAP)
                qpos.append(qi)
                spos.append(si)
        elif op in "DN":
            for _ in range(num):
                si += 1
                qas.append(_GAP)
                sas.append(subject[si])
                qpos.append(qi)
                spos.append(si)
        elif op in "SHP":
            continue
        else:
            raise AssertionError(op)
    return qb, qi, si, qas, sas, qpos, spos


def _random_cigar(rng, with_quirky_clips: bool):
    ops = []
    if rng.random() < 0.4:
        if with_quirky_clips and rng.random() < 0.3:
            ops.append(("H", int(rng.integers(1, 10))))
        else:
            ops.append((str(rng.choice(["S", "H"])), int(rng.integers(1, 20))))
    body = []
    n_mid = int(rng.integers(1, 8))
    for i in range(n_mid):
        kind = "M" if i % 2 == 0 else str(rng.choice(list("IDN=X")))
        body.append((kind, int(rng.integers(1, 30))))
    if body[-1][0] not in "M=X":
        body.append(("M", int(rng.integers(1, 30))))
    ops += body
    if rng.random() < 0.4:
        ops.append((str(rng.choice(["S", "H"])), int(rng.integers(1, 20))))
    return ops


def test_fuzz_cigar_expansion_vs_naive(tmp_path):
    """expand_alignment must match the naive per-column expander on random
    CIGARs (incl. N/=/X ops and clip placements), and every emitted column
    must satisfy the reference's runtime self-check
    (bam_info.cpp:399-416): non-gap query columns equal the raw query char
    at qpos, non-gap subject columns equal the genome char at spos."""
    from hifimeth_tpu.io.fasta import FastaDatabase
    from hifimeth_tpu.quant.alignment import expand_alignment

    rng = np.random.default_rng(99)
    glen = 1 << 16
    genome = rng.choice(list(b"ACGT"), glen).astype(np.uint8)
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1 fuzz\n")
        g = genome.tobytes().decode()
        for i in range(0, glen, 80):
            f.write(g[i:i + 80] + "\n")
    db = FastaDatabase(str(fa))

    for case in range(400):
        cigar = _random_cigar(rng, with_quirky_clips=True)
        # consumed lengths: NOTE the reference treats soft clips after the
        # first op as consuming NOTHING, so the query must be sized by its
        # semantics (first-op S + M/I/=/X), not the SAM spec's
        qlen = (cigar[0][1] if cigar[0][0] == "S" else 0) + sum(
            n for op, n in (cigar[1:] if cigar[0][0] in "SH" else cigar)
            if op in "MI=X")
        slen = sum(n for op, n in cigar if op in "MDN=X")
        pos = int(rng.integers(0, glen - slen - 1))
        query = rng.choice(list(b"ACGT"), qlen).astype(np.uint8)
        # make ~80% of aligned columns match so pi/epi are meaningful
        rec = BamRecord(qname=f"c{case}", flag=0, refid=0, pos=pos, mapq=60)
        rec.set_seq(query)
        rec.set_cigar_str("".join(f"{n}{op}" for op, n in cigar))
        exp = expand_alignment(rec, db, "chr1")
        qb, qe_i, se_i, qas, sas, qpos, spos = naive_expand(
            query.tobytes(), genome.tobytes(), pos, cigar)
        assert exp.qb == qb
        assert exp.qe == qe_i + 1
        assert exp.se == se_i + 1
        np.testing.assert_array_equal(exp.qas, np.asarray(qas, np.uint8))
        np.testing.assert_array_equal(exp.sas, np.asarray(sas, np.uint8))
        np.testing.assert_array_equal(exp.qpos, np.asarray(qpos))
        np.testing.assert_array_equal(exp.spos, np.asarray(spos))
        # the reference's column self-check, applied to the production output
        qg = exp.qas == _GAP
        sg = exp.sas == _GAP
        np.testing.assert_array_equal(exp.qas[~qg], query[exp.qpos[~qg]])
        np.testing.assert_array_equal(exp.sas[~sg], genome[exp.spos[~sg]])
        assert not (qg & sg).any()
        # pi is a plain column identity; verify against the naive columns
        want_pi = (100.0 * sum(a == b for a, b in zip(qas, sas)) / len(qas)
                   if qas else 0.0)
        assert exp.pi == pytest.approx(want_pi)


# ---------------------------------------------------------------------------
# D. SAM text round trip: random records serialized to SAM lines by an
# INDEPENDENT formatter (plain string building from the record fields, no
# shared code with SamTextReader) must parse back to identical records.


def _sam_line_indep(rec, refs):
    rname = "*" if rec.refid < 0 else refs[rec.refid][0]
    ops = "MIDNSHP=X"
    cig = "*" if len(rec.cigar) == 0 else "".join(
        f"{int(ln)}{ops[int(op)]}" for op, ln in zip(*rec.cigar_ops()))
    seq = rec.seq_ascii().tobytes().decode() or "*"
    qual = "*" if rec.qual is None else "".join(
        chr(int(q) + 33) for q in rec.qual)
    cols = [rec.qname, str(rec.flag), rname, str(rec.pos + 1), str(rec.mapq),
            cig, "*", "0", "0", seq, qual]
    for tag, ty, val in rec.tags:
        if ty in "cCsSiI":
            cols.append(f"{tag}:i:{int(val)}")
        elif ty == "f":
            cols.append(f"{tag}:f:{val:g}")
        elif ty == "B":
            sub, arr = val
            body = ",".join(f"{x:g}" if sub == "f" else str(int(x))
                            for x in arr)
            cols.append(f"{tag}:B:{sub}" + ("," + body if len(arr) else ""))
        else:
            cols.append(f"{tag}:{ty}:{val}")
    return "\t".join(cols)


def test_fuzz_sam_text_roundtrip(tmp_path):
    """500 random records -> independent SAM formatting -> SamTextReader
    must reproduce the semantic fields (SAM has no unmapped-flag nibble
    packing or int-width subtleties; compare field-by-field)."""
    rng = np.random.default_rng(4321)
    refs = [("chrA", 1 << 21)]
    recs = []
    for _ in range(500):
        r = _random_record(rng)
        # SAM constraints the generator doesn't know: qname/Z tags must not
        # contain tabs (generator uses printable non-tab ranges already);
        # an int tag is re-typed by width on parse, so compare values only
        recs.append(r)
    lines = ["@HD\tVN:1.6\tSO:unknown", "@SQ\tSN:chrA\tLN:2097152"]
    lines += [_sam_line_indep(r, refs) for r in recs]
    sam = tmp_path / "fuzz.sam"
    sam.write_text("\n".join(lines) + "\n")

    got = list(BamReader(str(sam)))
    assert len(got) == len(recs)
    for a, b in zip(got, recs):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert a.refid == b.refid and a.pos == b.pos and a.mapq == b.mapq
        np.testing.assert_array_equal(a.cigar, b.cigar)
        np.testing.assert_array_equal(a.seq_ascii(), b.seq_ascii())
        if b.qual is None:
            assert a.qual is None
        else:
            np.testing.assert_array_equal(a.qual, b.qual)
        assert len(a.tags) == len(b.tags)
        for (ta, ya, va), (tb, yb, vb) in zip(a.tags, b.tags):
            assert ta == tb
            if yb in "cCsSiI":
                assert int(va) == int(vb), (ta, va, vb)
            elif yb == "f":
                assert abs(float(va) - float(vb)) <= 1e-5 * max(
                    1.0, abs(float(vb)))
            elif yb == "B":
                sa, aa = va
                sb, ab = vb
                if sb == "f":
                    np.testing.assert_allclose(
                        np.asarray(aa, np.float32), ab, rtol=1e-5)
                else:
                    np.testing.assert_array_equal(
                        np.asarray(aa, np.int64), np.asarray(ab, np.int64))
            else:
                assert va == vb
