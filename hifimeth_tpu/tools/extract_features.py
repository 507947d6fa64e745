"""`extract-features`: build training feature blobs from an aligned kinetics
BAM + BS-seq ground-truth labels.

The reference trains from pre-assembled binary blobs (sample_dataset.py:55-75)
whose producer is not shipped; this tool closes that gap.  For each primary
aligned read with kinetics, it packs the 5 per-base planes (2-bit codes, fi,
fp, ri, rp - reverse tracks re-indexed to forward coordinates, matching both
the blob convention and features/read_decode.py), maps candidate context
sites to the genome via alignment-exact motif matching (quant/mapping.py),
labels them from a converted BS-seq BED (cov >= 10, freq 0%% -> 0 / 100%% ->
1, as eval.cpp:104-111), and writes the features/samples/offsets triplet that
`hifimeth-tpu train` consumes.
"""
from __future__ import annotations

import sys


from ..features.read_decode import decode_read
from ..io.bam import BamReader
from ..io.fasta import FastaDatabase
from ..quant.alignment import expand_alignment
from ..quant.mapping import map_chg_sites, map_chh_sites, map_cpg_sites
from ..tools.evaltool import load_bismark_labels
from ..utils.logging import log

_MAPPERS = {"CPG": map_cpg_sites, "CHG": map_chg_sites, "CHH": map_chh_sites}


def run_extract_features(reference_path: str, context: str,
                         bismark_bed_path: str, bam_path: str,
                         output_prefix: str, min_read_size: int = 1000,
                         io_threads: int = 8) -> dict:
    ctx = context.upper()
    if ctx not in _MAPPERS:
        raise SystemExit(f"Illegal 5mc context: {context}")
    mapper = _MAPPERS[ctx]

    db = FastaDatabase(reference_path)
    reader = BamReader(bam_path, threads=io_threads)
    hdr = reader.header
    sizes = {name: length for name, length in hdr.refs}
    labels = load_bismark_labels(sizes, bismark_bed_path)

    feat_f = open(f"{output_prefix}.features", "wb")
    samp_f = open(f"{output_prefix}.samples", "w")
    offs_f = open(f"{output_prefix}.offsets", "w")

    qid = 0
    base_off = 0
    n_pos = n_neg = 0
    for rec in reader:
        if rec.is_unmapped or rec.is_secondary_or_supplementary:
            continue
        if rec.l_seq < min_read_size:
            continue
        read = decode_read(rec)
        if read is None:
            continue
        aln = expand_alignment(rec, db, hdr.tid2name(rec.refid))
        if aln is None:
            continue
        mq, ms = mapper(aln)
        if len(mq) == 0:
            continue
        chr_labels = labels[hdr.tid2name(rec.refid)]
        lab = chr_labels[ms]
        keep = lab != -1
        mq, lab = mq[keep], lab[keep]
        if len(mq) == 0:
            continue

        # blob layout: 5 planes of qsize bytes (codes, fi, fp, ri, rp), all
        # forward-coordinate (sample_dataset.py:89-95 with ri/rp fwd-indexed)
        feat_f.write(read.codes.tobytes())
        feat_f.write(read.fi.tobytes())
        feat_f.write(read.fp.tobytes())
        feat_f.write(read.ri.tobytes())
        feat_f.write(read.rp.tobytes())
        for qoff, l in zip(mq, lab):
            samp_f.write(f"{qid}\t{qoff}\t{int(l)}\n")
        n_pos += int((lab == 1).sum())
        n_neg += int((lab == 0).sum())
        offs_f.write(f"{base_off}\t{qid}\t{read.size}\t{read.fn}\t{read.rn}\n")
        base_off += read.size
        qid += 1
        if qid % 10000 == 0:
            log("%10d reads, %d samples", qid, n_pos + n_neg)

    feat_f.close()
    samp_f.close()
    offs_f.close()
    reader.close()
    log("wrote %d reads, %d positive / %d negative samples", qid, n_pos, n_neg)
    return {"reads": qid, "positives": n_pos, "negatives": n_neg}


def main(argv) -> int:
    if len(argv) != 5:
        print("USAGE:\n  hifimeth-tpu extract-features reference context "
              "labels-bed kinetics-bam output-prefix", file=sys.stderr)
        return 1
    run_extract_features(argv[0], argv[1], argv[2], argv[3], argv[4])
    return 0
