"""Full-pipeline acceptance test mirroring the reference tutorial run.sh:
call -> (synthetic alignment) -> pileup -> cov2bed -> corr -> eval ->
read-level-eval (README.md:70-151)."""
import numpy as np

from hifimeth_tpu.cli import main
from hifimeth_tpu.engine.call import CallConfig, run_call
from hifimeth_tpu.features.read_decode import native_fwd_seq
from hifimeth_tpu.io.bam import BamHeader, BamReader, BamWriter
from hifimeth_tpu.quant.pileup import run_pileup
from hifimeth_tpu.tools.corr import run_corr

from util import make_kinetics_read, revcomp_bytes


def test_full_pipeline(tmp_path):
    rng = np.random.default_rng(123)
    genome = "".join(rng.choice(list("ACGT"), 6000))
    fasta = tmp_path / "ref.fa"
    fasta.write_text(f">chr1\n{genome}\n")

    # HiFi-like reads = genome substrings with kinetics, some reverse-stored
    from hifimeth_tpu.io.bam import BamRecord
    reads = []
    coords = []
    for i in range(24):
        start = int(rng.integers(0, len(genome) - 1500))
        L = int(rng.integers(1100, 1500))
        L = min(L, len(genome) - start)
        fwd = genome[start:start + L].encode()
        flag = 16 if i % 3 == 0 else 0
        stored = revcomp_bytes(fwd) if flag & 16 else fwd
        rec = BamRecord(qname=f"m/{i}/ccs", flag=4)  # unmapped input to call
        rec.set_seq(stored if flag & 16 else fwd)
        # store native-fwd orientation info for the later "alignment"
        for tag in ("fi", "ri", "fp", "rp"):
            rec.set_tag(tag, "B", ("C", rng.integers(0, 256, L).astype(np.uint8)))
        reads.append((rec, start, L, flag))
        coords.append((start, L, flag))

    in_bam = tmp_path / "reads.bam"
    with BamWriter(in_bam, BamHeader("@HD\tVN:1.6\tSO:unknown\n", [])) as w:
        for rec, *_ in reads:
            w.write(rec)

    # 1) call
    mod_bam = tmp_path / "mod.bam"
    run_call(str(in_bam), str(mod_bam), CallConfig(site_batch=512))

    # 2) "pbmm2": perfect-match alignment at the known coordinates
    called = list(BamReader(mod_bam))
    aligned = []
    for rec, (start, L, flag) in zip(called, coords):
        if flag & 16:
            # the aligner stores the reverse complement of the read for
            # reverse alignments; MM/ML stay valid because the parser
            # reconstructs the native-forward strand via flag 0x10
            rec.set_seq(revcomp_bytes(rec.seq_ascii().tobytes()))
        rec.flag = flag
        rec.refid = 0
        rec.pos = start
        rec.mapq = 60
        rec.set_cigar_str(f"{rec.l_seq}M")
        aligned.append(rec)
    aligned.sort(key=lambda r: r.pos)
    pbmm2 = tmp_path / "mod.pbmm2.bam"
    hdr = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("chr1", len(genome))])
    with BamWriter(pbmm2, hdr) as w:
        for r in aligned:
            w.write(r)

    # 3) pileup
    prefix = str(tmp_path / "P")
    stats = run_pileup(str(fasta), str(pbmm2), prefix, spill_dir=str(tmp_path))
    assert stats["bed_rows"] > 0
    cpg_bed = f"{prefix}.CpG.cov.bed"
    rows = open(cpg_bed).read().splitlines()
    assert rows, "no CpG rows produced"
    # every reported position is a genomic CpG
    for line in rows[:50]:
        chrom, s, e, freq, p, n = line.split("\t")
        pos = int(s)
        assert genome[pos:pos + 2] == "CG", f"non-CpG at {pos}"

    # 4) corr of the pileup against itself = 1
    r = run_corr(cpg_bed, cpg_bed, min_cov=1)
    if r is not None:
        assert abs(r - 1.0) < 1e-12

    # 5) cov2bed + eval + read-level-eval through the CLI
    cov = tmp_path / "bs.cov"
    with open(cov, "w") as f:
        for i in range(len(genome) - 1):
            if genome[i] == "C" and genome[i + 1] == "G":
                if i % 2:
                    f.write(f"chr1\t{i + 1}\t{i + 1}\t100\t12\t0\n")
                else:
                    f.write(f"chr1\t{i + 1}\t{i + 1}\t0\t0\t12\n")
    bs_bed = tmp_path / "bs.bed"
    assert main(["cov2bed", str(fasta), "CpG", str(cov), str(bs_bed)]) == 0
    assert main(["eval", str(fasta), str(bs_bed), str(pbmm2),
                 str(tmp_path / "rl")]) == 0
    import glob
    produced = glob.glob(str(tmp_path / "rl.CpG.*"))
    if produced:
        assert main(["read-level-eval", str(tmp_path / "rl.CpG"), "2"]) == 0
