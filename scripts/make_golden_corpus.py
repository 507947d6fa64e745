#!/usr/bin/env python3
"""Generate the pinned golden output corpus under tests/data/.

Run ONCE (on the CPU backend) from a verified tree, commit the outputs, and
never regenerate casually: tests/test_golden.py byte-diffs every future
build against these files, replacing the reference's acceptance protocol of
byte-level tutorial outputs (README.md:70-151, run.sh) in an environment
without the P.patens data.

    JAX_PLATFORMS=cpu python scripts/make_golden_corpus.py

NOTE: the call-tag golden (golden_call_tags.json) must be regenerated from
inside pytest so the compiled XLA program matches the test environment
exactly (the compiled CPU program depends on the exact XLA_FLAGS string):

    HIFIMETH_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def gen_call_corpus(data_dir):
    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader
    from util import make_kinetics_read, write_bam

    rng = np.random.default_rng(20260818)
    recs = []
    for i in range(10):
        flag = 16 if i % 3 == 1 else 4
        raw = i == 4                       # one raw-frame (B,S) kinetics read
        recs.append(make_kinetics_read(rng, f"golden/{i}/ccs",
                                       int(rng.integers(1200, 2600)),
                                       flag=flag, raw_frames=raw))
    # one read below min_read_size (passes through unannotated) and one
    # without kinetics
    recs.append(make_kinetics_read(rng, "golden/short/ccs", 700))
    nok = make_kinetics_read(rng, "golden/nokin/ccs", 1500)
    for tag in ("fi", "ri", "fp", "rp"):
        nok.del_tag(tag)
    recs.append(nok)

    in_bam = os.path.join(data_dir, "golden_call_in.bam")
    write_bam(in_bam, recs)

    cfg = CallConfig(gather_impl="folded", compute_dtype="float32",
                     site_batch=512)
    with tempfile.TemporaryDirectory() as td:
        out_bam = os.path.join(td, "out.bam")
        run_call(in_bam, out_bam, cfg)
        tags = []
        for rec in BamReader(out_bam):
            mm = rec.get_tag("MM")
            ml = rec.get_tag("ML")
            mn = rec.get_tag("MN")
            tags.append({
                "qname": rec.qname,
                "MM": mm[1] if mm else None,
                "ML": ml[1][1].tolist() if ml else None,
                "MN": mn[1] if mn else None,
            })
    with open(os.path.join(data_dir, "golden_call_tags.json"), "w") as f:
        json.dump(tags, f, indent=1)
    print(f"call corpus: {len(recs)} reads, "
          f"{sum(len(t['ML'] or []) for t in tags)} ML bytes")


def gen_pileup_corpus(data_dir):
    from hifimeth_tpu.quant.pileup import run_pileup
    from test_pileup import make_mapped_mod_bam
    import pathlib

    rng = np.random.default_rng(77)
    with tempfile.TemporaryDirectory() as td:
        fasta, bam, chroms, recs = make_mapped_mod_bam(
            pathlib.Path(td), rng, n_reads=40)
        shutil.copy(fasta, os.path.join(data_dir, "golden_ref.fa"))
        shutil.copy(bam, os.path.join(data_dir, "golden_mapped.bam"))
        prefix = os.path.join(td, "golden")
        res = run_pileup(str(fasta), str(bam), prefix, spill_dir=td)
        for ctx in ("CpG", "CHG", "CHH"):
            shutil.copy(f"{prefix}.{ctx}.cov.bed",
                        os.path.join(data_dir, f"golden_pileup.{ctx}.cov.bed"))
    print(f"pileup corpus: thresholds={res['thresholds']}, "
          f"rows={res['bed_rows']}")


def gen_cov2bed_corpus(data_dir):
    """Synthetic Bismark .cov over golden_ref.fa + its 3 context BEDs."""
    from hifimeth_tpu.io.fasta import FastaDatabase
    from hifimeth_tpu.tools.cov2bed import run_cov2bed

    rng = np.random.default_rng(123)
    ref = os.path.join(data_dir, "golden_ref.fa")
    db = FastaDatabase(ref, quiet=True)
    cov_path = os.path.join(data_dir, "golden_bismark.cov")
    with open(cov_path, "w") as f:
        for sid in range(db.num_seqs):
            seq = db.seq_bases(sid)
            name = db.seq_name(sid)
            # every C/G position gets a row with 35% probability
            cg = np.flatnonzero((seq == ord("C")) | (seq == ord("G")))
            keep = cg[rng.random(len(cg)) < 0.35]
            for soff in keep:
                m = int(rng.integers(0, 20))
                u = int(rng.integers(0, 20))
                if m + u == 0:
                    u = 1
                pos = int(soff) + 1            # 1-based bismark coordinate
                freq = 100.0 * m / (m + u)
                f.write(f"{name}\t{pos}\t{pos}\t{freq:g}\t{m}\t{u}\n")
    for ctx in ("CpG", "CHG", "CHH"):
        run_cov2bed(ref, ctx, cov_path,
                    os.path.join(data_dir, f"golden_cov2bed.{ctx}.bed"))
    print("cov2bed corpus written")


def gen_corr_golden(data_dir):
    from hifimeth_tpu.tools.corr import run_corr

    a = os.path.join(data_dir, "golden_pileup.CpG.cov.bed")
    b = os.path.join(data_dir, "golden_cov2bed.CpG.bed")
    r = run_corr(a, b, min_cov=1)
    with open(os.path.join(data_dir, "golden_corr.txt"), "w") as f:
        f.write(f"{r:.10f}\n")
    print(f"corr golden: r={r}")


if __name__ == "__main__":
    os.makedirs(DATA, exist_ok=True)
    gen_call_corpus(DATA)
    gen_pileup_corpus(DATA)
    gen_cov2bed_corpus(DATA)
    gen_corr_golden(DATA)
    print("golden corpus written to", DATA)
