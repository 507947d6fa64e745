"""CLI integration: drive every subcommand through cli.main."""
import os

import numpy as np
import pytest

from hifimeth_tpu.cli import main
from hifimeth_tpu.io.bam import BamReader

from test_pileup import make_mapped_mod_bam
from util import make_kinetics_read, write_bam


def test_usage_and_version(capsys):
    assert main([]) == 1
    assert main(["version"]) == 0
    out = capsys.readouterr()
    assert "0.1.0" in out.out


def test_cli_call(tmp_path):
    rng = np.random.default_rng(0)
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, [make_kinetics_read(rng, "r0", 1200)])
    out_bam = tmp_path / "out.bam"
    rc = main(["call", "-c", "cpg", "-s", "128", str(in_bam), str(out_bam)])
    assert rc == 0
    recs = list(BamReader(out_bam))
    assert recs[0].get_tag("MM") is not None
    # @PG line added
    assert "@PG\tID:hifimeth-tpu" in BamReader(out_bam).header.text


def test_cli_pileup_corr_eval(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=25)
    monkeypatch.chdir(tmp_path)
    prefix = str(tmp_path / "p")
    assert main(["pileup", str(fasta), str(bam), prefix]) == 0
    assert os.path.exists(f"{prefix}.CpG.cov.bed")
    # corr of a bed against itself = 1 (if enough loci)
    bed = f"{prefix}.CHH.cov.bed"
    if sum(1 for _ in open(bed)) >= 5:
        assert main(["corr", "-c", "1", bed, bed]) == 0

    # eval against synthetic labels
    rows = []
    for name, seq in chroms.items():
        for i, ch in enumerate(seq):
            if ch in "CG" and i % 2 == 0:
                rows.append(f"{name}\t{i}\t{i + 1}\t100\t12\t0")
            elif ch in "CG":
                rows.append(f"{name}\t{i}\t{i + 1}\t0\t0\t12")
    labels = tmp_path / "labels.bed"
    labels.write_text("\n".join(rows) + "\n")
    assert main(["eval", str(fasta), str(labels), str(bam),
                 str(tmp_path / "rl")]) == 0


def test_cli_cov2bed_sample(tmp_path):
    fa = tmp_path / "r.fa"
    fa.write_text(">c1\nACGGATCGAA\n")
    cov = tmp_path / "b.cov"
    cov.write_text("c1\t2\t2\t0\t7\t3\n")
    out = tmp_path / "o.bed"
    assert main(["cov2bed", str(fa), "CpG", str(cov), str(out)]) == 0
    assert out.read_text().startswith("c1\t1\t2")

    rng = np.random.default_rng(2)
    big_fa = tmp_path / "g.fa"
    big_fa.write_text(">c1\n" + "ACGT" * 500 + "\n")
    in_bam = tmp_path / "s.bam"
    write_bam(in_bam, [make_kinetics_read(rng, f"r{i}", 6000) for i in range(4)])
    out_bam = tmp_path / "sub.bam"
    assert main(["sample", str(big_fa), str(in_bam), "1", str(out_bam)]) == 0
    assert len(list(BamReader(out_bam))) >= 1


def test_cli_model_tools(tmp_path):
    onnx_out = tmp_path / "m.onnx"
    assert main(["export-model", "models/CpG.npz", str(onnx_out)]) == 0
    npz_dir = tmp_path / "imported"
    # import from our own exported dir layout
    os.makedirs(npz_dir)
    import shutil
    shutil.copy(onnx_out, tmp_path / "CpG.onnx")
    assert main(["import-model", str(tmp_path), str(npz_dir)]) == 0
    assert os.path.exists(npz_dir / "CpG.npz")


def test_cli_read_level_eval(tmp_path, capsys):
    rng = np.random.default_rng(3)
    for i in range(2):
        rows = [f"{int(l)}\t{int(l)}\t{l * 0.8 + 0.1:g}"
                for l in rng.integers(0, 2, 50)]
        (tmp_path / f"x.{i}").write_text("\n".join(rows) + "\n")
    assert main(["read-level-eval", str(tmp_path / "x"), "2"]) == 0


def test_cli_bad_command(capsys):
    assert main(["frobnicate"]) == 1


def test_launcher_pileup_spawn_workers(tmp_path):
    """The launcher's __main__ guard is load-bearing: multiprocessing spawn
    workers re-import the launcher as __mp_main__, and an unguarded launcher
    re-runs the subcommand in every worker (observed as a fork-bomb hang of
    `hifimeth-tpu pileup` at default threads)."""
    import subprocess
    import sys

    rng = np.random.default_rng(2)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=12)
    launcher = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hifimeth-tpu")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, launcher, "pileup", "-t", "2", str(fasta),
         str(bam), str(tmp_path / "q")],
        env=env, timeout=240, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert os.path.exists(str(tmp_path / "q") + ".CpG.cov.bed")
