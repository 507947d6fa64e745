import numpy as np
import pytest

from hifimeth_tpu.tools.corr import pearson, run_corr
from hifimeth_tpu.tools.cov2bed import run_cov2bed
from hifimeth_tpu.tools.read_level_metrics import (average_precision,
                                                  binary_metrics, roc_auc,
                                                  run_read_level_eval)


def _write_bed(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_corr_basic(tmp_path, capsys):
    rows1, rows2 = [], []
    rng = np.random.default_rng(0)
    f1 = rng.random(50)
    noise = f1 + rng.normal(0, 0.05, 50)
    for i, (a, b) in enumerate(zip(f1, noise)):
        pa = int(a * 20)
        pb = int(np.clip(b, 0, 1) * 20)
        rows1.append(("chr1", i * 10, i * 10 + 1, 0, pa, 20 - pa))
        rows2.append(("chr1", i * 10, i * 10 + 1, 0, pb, 20 - pb))
    # low-coverage rows must be filtered (cov < 5)
    rows1.append(("chr1", 9999, 10000, 0, 1, 1))
    b1, b2 = tmp_path / "a.bed", tmp_path / "b.bed"
    _write_bed(b1, rows1)
    _write_bed(b2, rows2)
    r = run_corr(str(b1), str(b2))
    v1 = np.array([r[4] / 20 for r in rows1[:-1]])
    v2 = np.array([r[4] / 20 for r in rows2])
    assert r == pytest.approx(pearson(v1, v2))
    assert r > 0.9


def test_corr_too_few_common(tmp_path):
    b1, b2 = tmp_path / "a.bed", tmp_path / "b.bed"
    _write_bed(b1, [("c", 0, 1, 0, 10, 0)])
    _write_bed(b2, [("c", 5, 6, 0, 10, 0)])
    assert run_corr(str(b1), str(b2)) is None


def test_pearson_matches_numpy():
    rng = np.random.default_rng(1)
    x, y = rng.random(100), rng.random(100)
    assert pearson(x, y) == pytest.approx(np.corrcoef(x, y)[0, 1])


def _write_fasta(path, chroms):
    with open(path, "w") as f:
        for n, s in chroms.items():
            f.write(f">{n}\n{s}\n")


def test_cov2bed_cpg(tmp_path):
    #         0123456789
    genome = "ACGGATCGAA"
    # CpG dyad at 1-2 (C@1,G@2) and 6-7
    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": genome})
    cov = tmp_path / "b.cov"
    # bismark rows are 1-based: C@1 -> row pos 2; G@2 -> row pos 3
    _write_bed(cov, [
        ("c1", 2, 2, 0.0, 7, 3),      # fwd C at 0-based 1
        ("c1", 3, 3, 0.0, 2, 8),      # rev G at 0-based 2 -> aggregated to 1
        ("c1", 8, 8, 0.0, 5, 5),      # rev G at 0-based 7 -> aggregated to 6
    ])
    out = tmp_path / "o.bed"
    run_cov2bed(str(fa), "CpG", str(cov), str(out))
    lines = out.read_text().splitlines()
    assert lines == [
        "c1\t1\t2\t45\t9\t11\tCG",        # (7+2)/(7+2+3+8)=45%
        "c1\t6\t7\t50\t5\t5\tCG",
    ]


def test_cov2bed_chg_quirks(tmp_path):
    # genome with CGG dyad: fwd CCG at 0, rev CGG; and CAG at 5 with rev CTG
    #         0123456789012
    genome = "CCGGACAGTCTGA"
    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": genome})
    cov = tmp_path / "b.cov"
    _write_bed(cov, [
        ("c1", 1, 1, 0.0, 4, 0),      # fwd CCG at 0
        ("c1", 4, 4, 0.0, 3, 1),      # G@3: genome[1:4]=CGG -> rev CCG kept AT G
        ("c1", 6, 6, 0.0, 2, 2),      # fwd CAG at 5
        ("c1", 9, 9, 0.0, 1, 3),      # G@8: genome[6:9]=AGT? no -> check below
    ])
    out = tmp_path / "o.bed"
    run_cov2bed(str(fa), "CHG", str(cov), str(out))
    lines = out.read_text().splitlines()
    # G@8 is genome[8]='T' actually; row ignored since base not C/G... verify
    # genome: C0 C1 G2 G3 A4 C5 A6 G7 T8 C9 T10 G11 A12
    # row pos4 -> 0-based 3 = 'G', genome[1:4] = "CGG" with c2='C',c1='G' -> rev CCG kept at 3
    # row pos6 -> 0-based 5 = 'C', genome[5:8] = "CAG" -> fwd CAG at 5
    # row pos9 -> 0-based 8 = 'T' -> no match
    assert lines == [
        "c1\t0\t1\t100\t4\t0\tCCG",
        "c1\t3\t4\t75\t3\t1\tCCG",
        "c1\t5\t6\t50\t2\t2\tCAG",
    ]


def test_cov2bed_chg_rev_aggregation(tmp_path):
    # rev CAG: genome CTG at 0-2, G@2 aggregates into C@0
    genome = "CTGAA"
    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": genome})
    cov = tmp_path / "b.cov"
    _write_bed(cov, [
        ("c1", 1, 1, 0.0, 4, 0),      # fwd CTG at 0
        ("c1", 3, 3, 0.0, 1, 3),      # rev: G@2, c2='C', c1='T' -> += at 0
    ])
    out = tmp_path / "o.bed"
    run_cov2bed(str(fa), "CHG", str(cov), str(out))
    assert out.read_text().splitlines() == ["c1\t0\t1\t62.5\t5\t3\tCTG"]


def test_cov2bed_chh(tmp_path):
    genome = "CATTTGAA"     # fwd CAT at 0; rev TTG at 3-5 -> site at G@5
    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": genome})
    cov = tmp_path / "b.cov"
    _write_bed(cov, [
        ("c1", 1, 1, 0.0, 3, 1),
        ("c1", 6, 6, 0.0, 2, 2),
    ])
    out = tmp_path / "o.bed"
    run_cov2bed(str(fa), "CHH", str(cov), str(out))
    # rev motif TTG maps to fwd motif name CAA (same table index)
    assert out.read_text().splitlines() == [
        "c1\t0\t1\t75\t3\t1\tCAT",
        "c1\t5\t6\t50\t2\t2\tCAA",
    ]


def test_metrics_basic():
    y = np.array([1, 1, 1, 0, 0, 0])
    p = np.array([1, 1, 0, 0, 0, 1])
    m = binary_metrics(y, p)
    assert m["accuracy"] == pytest.approx(4 / 6, abs=1e-4)
    assert m["precision"] == pytest.approx(2 / 3, abs=1e-4)
    assert m["recall"] == pytest.approx(2 / 3, abs=1e-4)
    assert m["specificity"] == pytest.approx(2 / 3, abs=1e-4)


def test_auc_ap_match_sklearn_formulas():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, 200)
    prob = np.clip(y * 0.5 + rng.random(200) * 0.6, 0, 1)
    # perfect separation sanity
    assert roc_auc(np.array([0, 0, 1, 1]), np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert roc_auc(np.array([0, 1]), np.array([0.5, 0.5])) == 0.5
    auc = roc_auc(y, prob)
    assert 0.7 < auc <= 1.0
    ap = average_precision(y, prob)
    assert 0.6 < ap <= 1.0
    try:
        from sklearn.metrics import average_precision_score, roc_auc_score
    except ImportError:
        return
    assert auc == pytest.approx(roc_auc_score(y, prob))
    assert ap == pytest.approx(average_precision_score(y, prob))


def test_run_read_level_eval(tmp_path):
    rng = np.random.default_rng(3)
    for i in range(2):
        rows = []
        for _ in range(100):
            label = int(rng.integers(0, 2))
            prob = np.clip(label * 0.6 + rng.random() * 0.5, 0, 1)
            rows.append(f"{label}\t{1 if prob >= 0.5 else 0}\t{prob:g}")
        (tmp_path / f"ev.{i}").write_text("\n".join(rows) + "\n")
    res = run_read_level_eval(str(tmp_path / "ev"), 2)
    assert 0.5 < res["accuracy"][0] <= 1.0
    assert 0.5 < res["auc"][0] <= 1.0


def test_cov2bed_vectorized_matches_loop(tmp_path):
    """The native/vectorized cov2bed path must emit byte-identical BEDs to
    the sequential row loop, for every context, on random input."""
    import numpy as np
    from hifimeth_tpu.io import native
    from hifimeth_tpu.tools.cov2bed import run_cov2bed
    if not native.available():
        import pytest
        pytest.skip("libbamcore not built")
    rng = np.random.default_rng(21)
    genome = "".join(rng.choice(list("ACGTN"), 4000, p=[.24, .26, .26, .23, .01]))
    fasta = tmp_path / "ref.fa"
    fasta.write_text(f">c1 x\n{genome[:2500]}\n>c2 y\n{genome[2500:]}\n")
    cov = tmp_path / "in.cov"
    with open(cov, "w") as f:
        for name, size in (("c1", 2500), ("c2", 1500)):
            pos = np.sort(rng.choice(size, size // 2, replace=False)) + 1
            for s in pos.tolist():
                # p + n >= 1: real Bismark .cov files only list covered
                # positions (0/0 rows are a pinned error, see
                # test_cov2bed_zero_coverage_row)
                p, n = int(rng.integers(0, 20)), int(rng.integers(1, 20))
                f.write(f"{name}\t{s}\t{s}\t{100*p/(p+n):g}\t{p}\t{n}\n")
    for ctx in ("CpG", "CHG", "CHH"):
        a, b = tmp_path / f"{ctx}.vec.bed", tmp_path / f"{ctx}.loop.bed"
        run_cov2bed(str(fasta), ctx, str(cov), str(a))
        orig = native._LIB
        try:
            native._LIB = False
            run_cov2bed(str(fasta), ctx, str(cov), str(b))
        finally:
            native._LIB = orig
        assert a.read_bytes() == b.read_bytes(), ctx


def test_cov2bed_zero_coverage_row(tmp_path):
    """A pcov=ncov=0 Bismark row at a motif position is a pinned ERROR in
    both the vectorized and row-loop paths: the reference hard-aborts on it
    (hbn_assert(cov > 0), cov_to_bed.cpp:27); real Bismark .cov files only
    list covered positions.  Regression for the accidental nan row + numpy
    RuntimeWarning the loop path used to emit."""
    import warnings

    import pytest
    from hifimeth_tpu.io import native
    from hifimeth_tpu.tools.cov2bed import run_cov2bed

    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": "AACGGATCGA"})
    cov = tmp_path / "in.cov"                 # 1-based pos 4 = the C of CG
    cov.write_text("c1\t4\t4\t0\t0\t0\n")
    out = tmp_path / "o.bed"
    with warnings.catch_warnings():
        warnings.simplefilter("error")        # nan divide must not happen
        with pytest.raises(ValueError, match="zero total coverage"):
            run_cov2bed(str(fa), "CpG", str(cov), str(out))
        orig = native._LIB
        try:
            native._LIB = False               # force the row-loop fallback
            with pytest.raises(ValueError, match="zero total coverage"):
                run_cov2bed(str(fa), "CpG", str(cov), str(out))
        finally:
            native._LIB = orig


def test_cov2bed_stdin_unsorted_fallback(tmp_path, monkeypatch):
    """Regression (round-4 ADVICE): with bismark_path='-' and unsorted rows,
    the row-loop fallback must reuse the bytes the native path already read
    from stdin instead of reopening the exhausted stream."""
    import io as _io
    import sys
    genome = "ACGGATCGAA"
    fa = tmp_path / "r.fa"
    _write_fasta(fa, {"c1": genome})
    # deliberately NOT position-sorted -> native fast path rejects, falls back
    rows = ("c1\t8\t8\t0.0\t5\t5\n"
            "c1\t2\t2\t0.0\t7\t3\n"
            "c1\t3\t3\t0.0\t2\t8\n")
    monkeypatch.setattr(sys, "stdin", _io.TextIOWrapper(
        _io.BytesIO(rows.encode()), encoding="utf-8"))
    out = tmp_path / "o.bed"
    run_cov2bed(str(fa), "CpG", "-", str(out))
    lines = out.read_text().splitlines()
    assert lines == [
        "c1\t1\t2\t45\t9\t11\tCG",
        "c1\t6\t7\t50\t5\t5\tCG",
    ]
