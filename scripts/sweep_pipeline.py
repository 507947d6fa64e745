#!/usr/bin/env python3
"""Interleaved A/B sweep of engine pipeline knobs on the live TPU.

Round-robins the candidate configs (A B C A B C ...) so a slow tunnel
window hits every candidate equally, and reports best-of plus per-round
samples.  All candidates reuse the SAME compiled programs (flush size,
ramp, queue depth and seg-align only change dispatch chunk counts), so
no recompiles happen beyond first-use bucket programs.  Edit the
`candidates` list for the knobs under test; round-5 campaigns measured
seg-align on/off, flush 512Ki-1Mi, queue depth 2/4, and ramp on/off
(docs/BENCHMARKS.md records the results).

Usage: python scripts/sweep_pipeline.py [--reads 200] [--rounds 4]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from bench import count_sites, make_synthetic_bam, tunnel_health
    from hifimeth_tpu.engine.call import CallConfig, run_call

    # (name, flush_bases, ramp)
    candidates = [
        ("768Ki-ramp", 768 << 10, None),
        ("768Ki-noramp", 768 << 10, ()),
        ("1Mi-ramp", 1 << 20, None),
        ("1Mi-noramp", 1 << 20, ()),
    ]

    with tempfile.TemporaryDirectory() as td:
        bam = os.path.join(td, "bench.bam")
        make_synthetic_bam(bam, args.reads, args.read_len, profile="plant")
        n_sites = count_sites(bam)
        out = os.path.join(td, "out.bam")
        rtt = tunnel_health()
        print(f"[sweep] tunnel RTT {rtt:.0f} ms, {n_sites} sites",
              file=sys.stderr)

        cfgs = {}
        for name, fb, ramp in candidates:
            c = CallConfig()
            c.flush_bases = fb
            if ramp is not None:
                c.flush_ramp = ramp
            cfgs[name] = c

        # warmup (any candidate; programs are shared)
        run_call(bam, out, cfgs[candidates[0][0]])

        best = {name: float("inf") for name, *_ in candidates}
        for r in range(args.rounds):
            for name, *_ in candidates:
                t0 = time.time()
                run_call(bam, out, cfgs[name])
                dt = time.time() - t0
                best[name] = min(best[name], dt)
                print(f"[sweep] round {r} {name}: {dt:.3f} s "
                      f"({n_sites / dt:,.0f} sites/s)", file=sys.stderr)
        print("[sweep] === best-of ===", file=sys.stderr)
        for name, *_ in candidates:
            print(f"[sweep] {name}: {best[name]:.3f} s "
                  f"({n_sites / best[name]:,.0f} sites/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
