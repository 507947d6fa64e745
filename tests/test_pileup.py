"""Pileup end-to-end vs an independent per-column brute-force transliteration
of the reference algorithm (pileup.cpp)."""
import numpy as np
import pytest

from hifimeth_tpu.features.read_decode import native_fwd_seq
from hifimeth_tpu.io.bam import BamHeader, BamRecord, BamWriter
from hifimeth_tpu.io.fasta import FastaDatabase
from hifimeth_tpu.io.mmtags import build_mod_tags, parse_mod_tags_flat
from hifimeth_tpu.quant.alignment import expand_alignment
from hifimeth_tpu.quant.mapping import (map_chg_sites, map_chh_sites,
                                        map_cpg_sites)
from hifimeth_tpu.quant.pileup import classify_read_mods, run_pileup
from hifimeth_tpu.quant.threshold import resolve_threshold

from util import revcomp_bytes

FWD_CHH = {"C" + a + b for a in "ACT" for b in "ACT"}
REV_CHH = {"TTG", "TGG", "TAG", "GTG", "GGG", "GAG", "ATG", "AGG", "AAG"}


# ---------------------------------------------------------------------------
# fixture generation


def _simulate_alignment(rng, genome: str, flag: int):
    """Generate (stored_seq, cigar_str, pos) of a read aligned to genome with
    mismatches/indels and soft clips."""
    glen = len(genome)
    pos = int(rng.integers(0, glen - 300))
    cig = []
    stored = []
    gi = pos
    # leading soft clip sometimes
    if rng.random() < 0.5:
        n = int(rng.integers(1, 8))
        stored.append("".join(rng.choice(list("ACGT"), n)))
        cig.append((n, "S"))
    target_len = int(rng.integers(150, 280))
    while gi - pos < target_len and gi < glen - 1:
        r = rng.random()
        if r < 0.85:                       # match run
            n = int(rng.integers(5, 40))
            n = min(n, glen - 1 - gi)
            stored.append(genome[gi:gi + n])
            if cig and cig[-1][1] == "M":
                cig[-1] = (cig[-1][0] + n, "M")
            else:
                cig.append((n, "M"))
            gi += n
        elif r < 0.92:                     # mismatch
            stored.append(rng.choice([c for c in "ACGT" if c != genome[gi]]))
            if cig and cig[-1][1] == "M":
                cig[-1] = (cig[-1][0] + 1, "M")
            else:
                cig.append((1, "M"))
            gi += 1
        elif r < 0.96:                     # insertion
            n = int(rng.integers(1, 4))
            stored.append("".join(rng.choice(list("ACGT"), n)))
            cig.append((n, "I"))
        else:                              # deletion
            n = int(rng.integers(1, 4))
            n = min(n, glen - 1 - gi)
            cig.append((n, "D"))
            gi += n
    if rng.random() < 0.5:
        n = int(rng.integers(1, 8))
        stored.append("".join(rng.choice(list("ACGT"), n)))
        cig.append((n, "S"))
    cigar_str = "".join(f"{n}{op}" for n, op in cig)
    return "".join(stored), cigar_str, pos


def make_mapped_mod_bam(tmp_path, rng, n_reads=40, seed_genome=0):
    grng = np.random.default_rng(seed_genome)
    chroms = {
        "chrA": "".join(grng.choice(list("ACGT"), 2500)),
        "chrB": "".join(grng.choice(list("ACGT"), 1500)),
    }
    fasta = tmp_path / "ref.fa"
    with open(fasta, "w") as f:
        for name, seq in chroms.items():
            f.write(f">{name} description\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + "\n")

    recs = []
    for i in range(n_reads):
        name = "chrA" if rng.random() < 0.6 else "chrB"
        tid = 0 if name == "chrA" else 1
        flag = 16 if rng.random() < 0.5 else 0
        stored, cigar_str, pos = _simulate_alignment(rng, chroms[name], flag)
        rec = BamRecord(qname=f"read{i}", flag=flag, refid=tid, pos=pos,
                        mapq=int(rng.integers(0, 61)))
        rec.set_seq(stored.encode())
        rec.set_cigar_str(cigar_str)
        # random mod calls on the native-forward strand
        fwd_seq = native_fwd_seq(rec)
        cpos = np.flatnonzero(fwd_seq == ord("C"))
        gpos = np.flatnonzero(fwd_seq == ord("G"))
        nf = int(rng.integers(0, max(1, len(cpos))))
        nr = int(rng.integers(0, max(1, len(gpos))))
        fq = np.sort(rng.choice(cpos, nf, replace=False)) if nf else np.empty(0, np.int64)
        rq = np.sort(rng.choice(gpos, nr, replace=False)) if nr else np.empty(0, np.int64)
        fp = rng.integers(0, 256, nf).astype(np.uint8)
        rp = rng.integers(0, 256, nr).astype(np.uint8)
        build_mod_tags(rec, fwd_seq, fq, fp, rq, rp)
        recs.append(rec)
    # occasional secondary flag record (excluded from histograms)
    recs[3].flag |= 0x100

    recs.sort(key=lambda r: (r.refid, r.pos))
    bam = tmp_path / "mod.pbmm2.bam"
    hdr = BamHeader("@HD\tVN:1.6\tSO:coordinate\n",
                    [(n, len(s)) for n, s in chroms.items()])
    with BamWriter(bam, hdr) as w:
        for r in recs:
            w.write(r)
    return fasta, bam, chroms, recs


# ---------------------------------------------------------------------------
# brute-force reference transliteration


def brute_expand(rec, genome: str):
    """Per-column expansion, straight port of cigar_to_alignment."""
    query = rec.seq_ascii().tobytes().decode()
    ops, lens = rec.cigar_ops()
    ops = list(ops)
    lens = list(lens)
    qb = 0
    start = 0
    if ops and ops[0] == 4:     # S
        qb = lens[0]
        start = 1
    elif ops and ops[0] == 5:   # H
        start = 1
    qi = qb - 1
    si = -1
    qas, sas, qpos, spos = [], [], [], []
    sub = genome[rec.pos:]
    for op, num in list(zip(ops, lens))[start:]:
        ch = "MIDNSHP=X"[op]
        if ch in "M=X":
            for _ in range(num):
                qi += 1; si += 1
                qas.append(query[qi]); sas.append(sub[si])
                qpos.append(qi); spos.append(si)
        elif ch == "I":
            for _ in range(num):
                qi += 1
                qas.append(query[qi]); sas.append("-")
                qpos.append(qi); spos.append(si)
        elif ch in "DN":
            for _ in range(num):
                si += 1
                qas.append("-"); sas.append(sub[si])
                qpos.append(qi); spos.append(si)
    return ("".join(qas), "".join(sas), qpos,
            [s + rec.pos for s in spos], qb, qi + 1)


def brute_pileup(chroms, recs, min_mapq=0, min_pi=0.0):
    """Straight port of pileup.cpp pass 1 + threshold + pass 2."""
    bins = [np.zeros(256, np.int64) for _ in range(3)]
    spill = []            # (sid, soff, prob, motif) in emission order
    names = list(chroms)
    for rec in recs:
        fwd_seq = native_fwd_seq(rec)
        qoffs, strands, codes, probs = parse_mod_tags_flat(rec, fwd_seq)
        if len(qoffs) == 0:
            continue
        s = fwd_seq.tobytes().decode()
        L = len(s)
        if not (rec.flag & 0x900):
            for qoff, code, prob in zip(qoffs, codes, probs):
                b = s[qoff]
                if b == "C":
                    if qoff + 1 < L and s[qoff + 1] == "G":
                        bins[0][prob] += 1
                    elif qoff + 2 < L and s[qoff + 1] in "ACT" and s[qoff + 2] == "G":
                        bins[1][prob] += 1
                    elif qoff + 2 < L and s[qoff + 1] in "ACT" and s[qoff + 2] in "ACT":
                        bins[2][prob] += 1
                elif b == "G":
                    if qoff - 2 >= 0 and s[qoff - 2:qoff + 1] in REV_CHH:
                        bins[2][prob] += 1
        if rec.mapq < min_mapq:
            continue
        genome = chroms[names[rec.refid]]
        qas, sas, qpos, spos, qb, qe = brute_expand(rec, genome)
        pi = 100.0 * sum(a == b for a, b in zip(qas, sas)) / len(qas)
        if pi < min_pi:
            continue
        qdir = 1 if rec.flag & 16 else 0
        qsize = rec.l_seq
        has_prob = {}
        for qoff, code, prob in zip(qoffs, codes, probs):
            if chr(code) == "m":
                has_prob[qoff] = prob
        n = len(qas)
        sid = rec.refid
        for i in range(n - 1):
            if qas[i:i + 2] == "CG" and sas[i:i + 2] == "CG":
                qoff = qpos[i] if qdir == 0 else qsize - 1 - (qpos[i] + 1)
                if qoff in has_prob:
                    spill.append((sid, spos[i], has_prob[qoff], 0))
        for i in range(n - 2):
            q3, s3 = qas[i:i + 3], sas[i:i + 3]
            qoff = None
            if qdir == 0:
                if q3 == s3 and q3 in ("CCG", "CAG", "CTG"):
                    qoff = qpos[i]
            else:
                if q3 == s3 and q3 in ("CGG", "CAG", "CTG"):
                    qoff = qsize - 1 - (qpos[i] + 2)
            if qoff is not None and qoff in has_prob:
                spill.append((sid, spos[i], has_prob[qoff], 1))
        for i in range(n - 2):
            q3, s3 = qas[i:i + 3], sas[i:i + 3]
            if q3 == s3 and q3 in FWD_CHH:
                qoff = qpos[i] if qdir == 0 else qsize - 1 - qpos[i]
                if qoff in has_prob:
                    spill.append((sid, spos[i], has_prob[qoff], 2))
        for i in range(n - 2):
            q3, s3 = qas[i:i + 3], sas[i:i + 3]
            if q3 == s3 and q3 in REV_CHH:
                qoff = (qpos[i] + 2) if qdir == 0 else qsize - 1 - (qpos[i] + 2)
                if qoff in has_prob:
                    spill.append((sid, spos[i] + 2, has_prob[qoff], 2))

    thresholds = [resolve_threshold(b, verbose=False) for b in bins]
    # pass 2
    state = {}       # (sid, soff) -> [pcov, ncov, motif]
    for sid, soff, prob, motif in spill:
        key = (sid, soff)
        e = state.setdefault(key, [0, 0, motif])
        if prob >= thresholds[motif]:
            e[0] += 1
        else:
            e[1] += 1
        e[2] = motif
    beds = {0: [], 1: [], 2: []}
    for sid, name in enumerate(names):
        for (s, soff), (p, nn, motif) in sorted(
                (k, v) for k, v in state.items() if k[0] == sid):
            cov = p + nn
            freq = 100.0 * p / cov
            beds[motif].append(f"{name}\t{soff}\t{soff + 1}\t{freq:g}\t{p}\t{nn}")
    return bins, thresholds, beds


# ---------------------------------------------------------------------------


def test_expand_alignment_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(100)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=25)
    db = FastaDatabase(str(fasta), quiet=True)
    names = list(chroms)
    for rec in recs:
        aln = expand_alignment(rec, db, names[rec.refid])
        qas, sas, qpos, spos, qb, qe = brute_expand(rec, chroms[names[rec.refid]])
        assert aln.qas.tobytes().decode() == qas
        assert aln.sas.tobytes().decode() == sas
        assert list(aln.qpos) == qpos
        assert list(aln.spos) == spos
        assert aln.qb == qb and aln.qe == qe


def test_pileup_end_to_end_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(7)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=40)
    prefix = str(tmp_path / "out")
    stats = run_pileup(str(fasta), str(bam), prefix,
                       spill_dir=str(tmp_path))
    bins, thresholds, beds = brute_pileup(chroms, recs)
    assert stats["thresholds"] == thresholds
    for motif, ctx in enumerate(("CpG", "CHG", "CHH")):
        with open(f"{prefix}.{ctx}.cov.bed") as f:
            got = [l.rstrip("\n") for l in f]
        assert got == beds[motif], f"{ctx} BED mismatch"


def test_pileup_rejects_unsorted(tmp_path):
    hdr = BamHeader("@HD\tVN:1.6\tSO:unknown\n", [("c", 100)])
    bam = tmp_path / "x.bam"
    with BamWriter(bam, hdr) as w:
        pass
    fasta = tmp_path / "r.fa"
    fasta.write_text(">c\n" + "ACGT" * 25 + "\n")
    with pytest.raises(SystemExit):
        run_pileup(str(fasta), str(bam), str(tmp_path / "p"))


def test_threshold_valley():
    bins = np.zeros(256, np.int64)
    # bimodal: peaks at 40 and 220, valley at 130
    for i in range(20, 236):
        bins[i] = 1000 + abs(i - 130) * 100
    assert resolve_threshold(bins, verbose=False) == 130
    # not enough samples -> 128
    assert resolve_threshold(np.zeros(256, np.int64), verbose=False) == 128


def test_classify_read_mods():
    s = np.frombuffer(b"ACGTTGCAGCCCTTG", np.uint8)
    #                   0123456789...
    # offsets: 1 C (CGT->CpG), 6 C (CAG->CHG), 9 C (CCC? s[9..11]=CCC CHH)
    qoffs = np.array([1, 6, 9, 2, 14])
    # s[2]='G': s[0:3]="ACG" not rev CHH; s[14]='G': s[12:15]="TTG" rev CHH
    cls = classify_read_mods(s, qoffs)
    assert list(cls) == [0, 1, 2, -1, 2]


def test_effective_identity():
    from hifimeth_tpu.quant.alignment import effective_identity
    a = np.frombuffer(b"ACGTACGT", np.uint8)
    b = np.frombuffer(b"ACGTACGA", np.uint8)
    assert effective_identity(a, b) == pytest.approx(100 * 7 / 8)
    # short gap (< 8) counts toward effective length
    qa = np.frombuffer(b"ACG---TACGT", np.uint8)
    sa = np.frombuffer(b"ACGTTTTACGT", np.uint8)
    assert effective_identity(qa, sa) == pytest.approx(100 * 8 / 11)
    # long gap (>= 8) excluded entirely
    qg = np.frombuffer(b"AC--------GT", np.uint8)
    sg = np.frombuffer(b"ACTTTTTTTTGT", np.uint8)
    assert effective_identity(qg, sg) == pytest.approx(100.0)
    # both-gap columns skipped
    qb = np.frombuffer(b"AC-GT", np.uint8)
    sb = np.frombuffer(b"AC-GT", np.uint8)
    assert effective_identity(qb, sb) == pytest.approx(100.0)


def test_parallel_pileup_matches_single(tmp_path):
    from hifimeth_tpu.quant.pileup import run_pileup_parallel
    rng = np.random.default_rng(17)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=30)
    p1 = str(tmp_path / "single")
    run_pileup(str(fasta), str(bam), p1, spill_dir=str(tmp_path))
    p2 = str(tmp_path / "par")
    run_pileup_parallel(str(fasta), str(bam), p2, workers=3,
                        spill_dir=str(tmp_path))
    for ctx in ("CpG", "CHG", "CHH"):
        a = open(f"{p1}.{ctx}.cov.bed").read()
        b = open(f"{p2}.{ctx}.cov.bed").read()
        # byte-equal INCLUDING order: the parallel pass 2 concatenates its
        # per-range part files in sid order
        assert a == b, f"{ctx} mismatch"


def test_expand_alignment_hard_clip_and_skip(tmp_path):
    """H leading clip (consumes nothing) and N (ref skip) expand like the
    reference (bam_info.cpp:287-336)."""
    genome = "ACGTACGTACGTACGTACGT"
    fa = tmp_path / "r.fa"
    fa.write_text(f">c\n{genome}\n")
    db = FastaDatabase(str(fa), quiet=True)
    rec = BamRecord(qname="h", flag=0, refid=0, pos=2, mapq=60)
    rec.set_seq(b"GTACGTAC")               # genome[2:10]
    rec.set_cigar_str("5H4M3N4M2H")
    aln = expand_alignment(rec, db, "c")
    # columns: 4 M + 3 N(gap on query) + 4 M
    assert aln.n_cols == 11
    assert aln.qas.tobytes().decode() == "GTAC---GTAC"
    assert aln.sas.tobytes().decode() == genome[2:13]
    assert aln.qb == 0 and aln.qe == 8
    assert aln.sb == 2 and aln.se == 13
    # qpos stalls during N; spos is absolute
    assert list(aln.qpos) == [0, 1, 2, 3, 3, 3, 3, 4, 5, 6, 7]
    assert list(aln.spos) == list(range(2, 13))


def test_pileup_mapq_and_identity_filters(tmp_path):
    """-q/-f filters drop reads from mapping but NOT from the histogram
    (mapQ is checked after histogramming, pileup.cpp:274)."""
    from hifimeth_tpu.quant.pileup import PileupConfig
    rng = np.random.default_rng(23)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=25)
    cfg = PileupConfig(min_mapq=30)
    p1 = str(tmp_path / "q30")
    s1 = run_pileup(str(fasta), str(bam), p1, cfg, spill_dir=str(tmp_path))
    bins1, thr1, beds1 = brute_pileup(chroms, recs, min_mapq=30)
    for m in range(3):
        np.testing.assert_array_equal(s1["bins"][m], bins1[m])
    for motif, ctx in enumerate(("CpG", "CHG", "CHH")):
        got = [l.rstrip("\n") for l in open(f"{p1}.{ctx}.cov.bed")]
        assert got == beds1[motif], f"{ctx} mapQ-filter mismatch"

    cfg2 = PileupConfig(min_identity=95.0)
    p2 = str(tmp_path / "pi95")
    run_pileup(str(fasta), str(bam), p2, cfg2, spill_dir=str(tmp_path))
    _, _, beds2 = brute_pileup(chroms, recs, min_pi=95.0)
    for motif, ctx in enumerate(("CpG", "CHG", "CHH")):
        got = [l.rstrip("\n") for l in open(f"{p2}.{ctx}.cov.bed")]
        assert got == beds2[motif], f"{ctx} identity-filter mismatch"
