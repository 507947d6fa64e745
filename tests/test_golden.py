"""Golden output corpus: byte-diff every pipeline output against pinned
fixtures under tests/data/.

This is the repo's analog of the reference's acceptance protocol — byte-level
tutorial outputs on P.patens (README.md:70-151, run.sh).  Real data is not
available in this environment, so the corpus was generated ONCE by the
verified round-2 pipeline (scripts/make_golden_corpus.py) and frozen: any
change that alters output bytes fails here loudly.  If a change is
*intentional* (e.g. a deliberate parity fix), regenerate with the script and
explain the diff in the commit message.
"""
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def _p(name):
    return os.path.join(DATA, name)


@pytest.fixture(scope="module")
def golden_exists():
    if not os.path.exists(_p("golden_call_tags.json")):
        pytest.skip("golden corpus not generated")


def test_golden_call_tags(tmp_path, golden_exists):
    """MM strings and MN are byte-exact; ML scaled probs compare exactly in
    the environment the corpus was generated in, with a +-1 u8 tolerance for
    XLA recompilation drift (the compiled CPU program - and hence f32
    reassociation at the u8 quantization boundary - depends on the exact
    XLA_FLAGS string and jaxlib version).  Regenerate from inside pytest:
    HIFIMETH_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py."""
    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader

    cfg = CallConfig(gather_impl="folded", compute_dtype="float32",
                     site_batch=512)
    out = tmp_path / "out.bam"
    run_call(_p("golden_call_in.bam"), str(out), cfg)
    got = list(BamReader(str(out)))

    if os.environ.get("HIFIMETH_REGEN_GOLDEN"):
        tags = []
        for rec in got:
            mm, ml, mn = (rec.get_tag(t) for t in ("MM", "ML", "MN"))
            tags.append({"qname": rec.qname,
                         "MM": mm[1] if mm else None,
                         "ML": ml[1][1].tolist() if ml else None,
                         "MN": mn[1] if mn else None})
        with open(_p("golden_call_tags.json"), "w") as f:
            json.dump(tags, f, indent=1)
        pytest.skip("golden call tags regenerated")

    with open(_p("golden_call_tags.json")) as f:
        want = json.load(f)
    assert len(got) == len(want)
    n_off = n_tot = 0
    for rec, w in zip(got, want):
        assert rec.qname == w["qname"]
        mm = rec.get_tag("MM")
        ml = rec.get_tag("ML")
        mn = rec.get_tag("MN")
        assert (mm[1] if mm else None) == w["MM"], rec.qname
        assert (mn[1] if mn else None) == w["MN"], rec.qname
        got_ml = ml[1][1].tolist() if ml else None
        assert (got_ml is None) == (w["ML"] is None), rec.qname
        if got_ml is not None:
            a = np.asarray(got_ml, int)
            b = np.asarray(w["ML"], int)
            assert len(a) == len(b), rec.qname
            assert np.abs(a - b).max() <= 1, rec.qname
            n_off += int((a != b).sum())
            n_tot += len(a)
    # in the generating environment this is an exact match; allow a small
    # drift fraction for recompiled-program reassociation only
    assert n_off <= 0.05 * n_tot, f"{n_off}/{n_tot} ML bytes drifted"


def test_golden_call_tags_pallas(tmp_path, golden_exists):
    """The production pallas path (interpret-mode kernel on the CPU backend)
    must reproduce the SAME golden call tags: a regression confined to the
    group-fetch gather/dispatch/unsort logic fails here directly instead of
    only through the indirect pallas-vs-slice equality tests."""
    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader

    cfg = CallConfig(gather_impl="pallas", compute_dtype="float32",
                     site_batch=512)
    out = tmp_path / "out.bam"
    run_call(_p("golden_call_in.bam"), str(out), cfg)
    got = list(BamReader(str(out)))

    with open(_p("golden_call_tags.json")) as f:
        want = json.load(f)
    assert len(got) == len(want)
    n_off = n_tot = 0
    for rec, w in zip(got, want):
        assert rec.qname == w["qname"]
        mm = rec.get_tag("MM")
        mn = rec.get_tag("MN")
        ml = rec.get_tag("ML")
        assert (mm[1] if mm else None) == w["MM"], rec.qname
        assert (mn[1] if mn else None) == w["MN"], rec.qname
        got_ml = ml[1][1].tolist() if ml else None
        assert (got_ml is None) == (w["ML"] is None), rec.qname
        if got_ml is not None:
            a = np.asarray(got_ml, int)
            b = np.asarray(w["ML"], int)
            assert len(a) == len(b), rec.qname
            assert np.abs(a - b).max() <= 1, rec.qname
            n_off += int((a != b).sum())
            n_tot += len(a)
    assert n_off <= 0.05 * n_tot, f"{n_off}/{n_tot} ML bytes drifted"


def test_golden_pileup_beds(tmp_path, golden_exists):
    from hifimeth_tpu.quant.pileup import run_pileup

    prefix = str(tmp_path / "p")
    run_pileup(_p("golden_ref.fa"), _p("golden_mapped.bam"), prefix,
               spill_dir=str(tmp_path))
    for ctx in ("CpG", "CHG", "CHH"):
        got = open(f"{prefix}.{ctx}.cov.bed").read()
        want = open(_p(f"golden_pileup.{ctx}.cov.bed")).read()
        assert got == want, f"{ctx} pileup BED diverged from golden corpus"


def test_golden_cov2bed(tmp_path, golden_exists):
    from hifimeth_tpu.tools.cov2bed import run_cov2bed

    for ctx in ("CpG", "CHG", "CHH"):
        out = tmp_path / f"c.{ctx}.bed"
        run_cov2bed(_p("golden_ref.fa"), ctx, _p("golden_bismark.cov"),
                    str(out))
        got = open(out).read()
        want = open(_p(f"golden_cov2bed.{ctx}.bed")).read()
        assert got == want, f"{ctx} cov2bed diverged from golden corpus"


def test_golden_corr(golden_exists):
    from hifimeth_tpu.tools.corr import run_corr

    r = run_corr(_p("golden_pileup.CpG.cov.bed"),
                 _p("golden_cov2bed.CpG.bed"), min_cov=1)
    want = float(open(_p("golden_corr.txt")).read().split()[0])
    assert r == pytest.approx(want, abs=1e-10)
