#!/usr/bin/env python3
"""Pileup at reference-tutorial scale (round-4 verdict #6).

The reference's unit of work is a 5.3 Mbp P.patens chromosome at ~30x
coverage (README.md:70,121-126); the bench's regular pileup leg is a toy
(150 reads over 1 Mb).  This script runs run_pileup_parallel on a synthetic
workload at that scale - >= 5.3 Mbp genome, thousands of 15 kb mapped mod
reads, a multi-GB-ish spill - with a configurable worker count, and reports
reads/s, Mbases/s, spill bytes and peak RSS for docs/BENCHMARKS.md.

Usage: python scripts/bench_pileup_scale.py [--reads 5000] [--workers 4]
       [--genome-mb 5.3] [--keep DIR]
"""
import argparse
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=5000)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--genome-mb", type=float, default=5.3)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--keep", default="", help="reuse/keep inputs in DIR")
    args = ap.parse_args()

    from bench import make_mapped_mod_bam
    from hifimeth_tpu.quant.pileup import run_pileup_parallel
    from hifimeth_tpu.utils.logging import bytes_to_datasize, peak_rss_bytes

    td = args.keep or tempfile.mkdtemp(prefix="hm_pileup_scale_")
    os.makedirs(td, exist_ok=True)
    fasta = os.path.join(td, "ref.fa")
    bam = os.path.join(td, "mod.bam")
    glen = int(args.genome_mb * 1e6)
    if not (args.keep and os.path.exists(bam)):
        print(f"[scale] generating {args.reads} x {args.read_len} bp mapped "
              f"mod reads over a {args.genome_mb} Mb genome...",
              file=sys.stderr)
        t0 = time.time()
        make_mapped_mod_bam(fasta, bam, args.reads, args.read_len, glen)
        print(f"[scale] generated in {time.time() - t0:.1f} s "
              f"(bam {bytes_to_datasize(os.path.getsize(bam))})",
              file=sys.stderr)

    prefix = os.path.join(td, "p")
    t0 = time.time()
    run_pileup_parallel(fasta, bam, prefix, workers=args.workers,
                        spill_dir=td)
    dt = time.time() - t0
    bases = args.reads * args.read_len
    beds = sorted(glob.glob(prefix + ".*.cov.bed"))
    rows = sum(sum(1 for _ in open(b)) for b in beds)
    print(f"[scale] {args.reads} reads ({bases / 1e6:.0f} Mb, "
          f"~{bases / glen:.0f}x coverage) in {dt:.1f} s = "
          f"{args.reads / dt:.0f} reads/s, {bases / dt / 1e6:.1f} Mbases/s "
          f"({args.workers} workers)", file=sys.stderr)
    print(f"[scale] BED rows: {rows:,}; peak RSS "
          f"{bytes_to_datasize(peak_rss_bytes())}", file=sys.stderr)
    if not args.keep:
        import shutil
        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
