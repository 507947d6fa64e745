#!/usr/bin/env python3
"""Benchmark: end-to-end all-context `call` throughput in 5mC sites/s.

Baseline derivation (BASELINE.md): the reference calls a 30x Arabidopsis
genome (~4.05 Gbp of reads) in ~2 h on 48 CPU threads.  All-context
candidate-site density at GC~=0.36 is ~0.30 sites/bp (fwd C's + rev-CHH G's),
giving ~1.2e9 CNN samples / 7200 s ~= 1.7e5 sites/s.

Run: python bench.py [--reads N] [--read-len L] [--dtype bf16|f32]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Secondary numbers (device-only throughput, bases/s) go to stderr.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SITES_PER_SEC = 1.7e5


def make_synthetic_bam(path, n_reads, read_len, seed=0):
    import numpy as np
    from hifimeth_tpu.io.bam import BamHeader, BamRecord, BamWriter

    rng = np.random.default_rng(seed)
    hdr = BamHeader("@HD\tVN:1.6\tSO:unknown\n", [])
    total_sites = 0
    with BamWriter(path, hdr, threads=8, level=1) as w:
        for i in range(n_reads):
            rec = BamRecord(qname=f"m/{i}/ccs", flag=4)
            seq = rng.choice(list(b"ACGT"), read_len).astype(np.uint8)
            rec.set_seq(seq, qual=np.full(read_len, 40, np.uint8))
            for tag in ("fi", "ri", "fp", "rp"):
                rec.set_tag(tag, "B", ("C", rng.integers(0, 256, read_len).astype(np.uint8)))
            rec.set_tag("fn", "C", 5)
            rec.set_tag("rn", "C", 5)
            w.write(rec)
    return path


def count_sites(bam_path):
    import numpy as np
    from hifimeth_tpu.features import sites as sitefind
    from hifimeth_tpu.features.read_decode import native_fwd_seq
    from hifimeth_tpu.io.bam import BamReader

    total = 0
    for rec in BamReader(bam_path):
        seq = native_fwd_seq(rec)
        total += len(sitefind.cpg_sites(seq))
        total += len(sitefind.chg_sites(seq))
        total += len(sitefind.chh_sites(seq)[0])
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--dtype", default="f32", choices=["bf16", "f32"])
    ap.add_argument("--site-batch", type=int, default=16384)
    ap.add_argument("--conv-impl", default="direct",
                    choices=["direct", "im2col", "auto"])
    ap.add_argument("--gather-impl", default="auto",
                    choices=["auto", "slice", "folded", "pallas"])
    ap.add_argument("--feat-channels", type=int, default=8)
    args = ap.parse_args()
    dtype = "bfloat16" if args.dtype == "bf16" else "float32"

    import tempfile
    from hifimeth_tpu.engine.call import CallConfig, run_call

    with tempfile.TemporaryDirectory() as td:
        bam = os.path.join(td, "bench.bam")
        print(f"[bench] generating {args.reads} x {args.read_len} bp reads...",
              file=sys.stderr)
        make_synthetic_bam(bam, args.reads, args.read_len)
        n_sites = count_sites(bam)
        out_bam = os.path.join(td, "out.bam")

        cfg = CallConfig(compute_dtype=dtype, site_batch=args.site_batch,
                         conv_impl=args.conv_impl,
                         gather_impl=args.gather_impl,
                         feat_channels=args.feat_channels)
        # warm-up run compiles everything (persistent-cache assisted)
        run_call(bam, out_bam, cfg)
        # best of 2 timed runs: device round-trip latency through shared TPU
        # front-ends varies ~30% run to run; best-of reflects machine speed
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            stats = run_call(bam, out_bam, cfg)
            dt = min(dt, time.time() - t0)

    rate = n_sites / dt
    bases = args.reads * args.read_len
    print(f"[bench] e2e: {n_sites:,} sites, {bases / dt / 1e6:.1f} Mbases/s, "
          f"{dt:.2f} s", file=sys.stderr)
    print(json.dumps({
        "metric": "call_sites_per_sec",
        "value": round(rate),
        "unit": "sites/s",
        "vs_baseline": round(rate / BASELINE_SITES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
