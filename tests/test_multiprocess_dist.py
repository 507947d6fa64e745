"""TRUE multi-process distributed tests: two jax.distributed processes on
the CPU backend (Gloo) running the real collective code paths."""
import os
import subprocess
import sys

import numpy as np
import pytest

from test_pileup import make_mapped_mod_bam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
pid = int(sys.argv[1])
n = int(sys.argv[2])
port = sys.argv[3]
repo = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=n, process_id=pid)
sys.path.insert(0, repo)
from hifimeth_tpu.parallel.dist import ShardSpec
from hifimeth_tpu.quant.pileup import run_pileup_multihost

fasta, bam, prefix, spill_dir = sys.argv[5:9]
spec = ShardSpec(pid, n, batch_size=3)
res = run_pileup_multihost(fasta, bam, prefix, spec, spill_dir=spill_dir)
print("worker", pid, "rows", res["bed_rows"], "thresholds", res["thresholds"],
      flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_pileup(tmp_path):
    rng = np.random.default_rng(31)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=30)

    # single-process reference output
    from hifimeth_tpu.quant.pileup import merge_pileup_shards, run_pileup
    single_prefix = str(tmp_path / "single")
    run_pileup(str(fasta), str(bam), single_prefix, spill_dir=str(tmp_path))

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    prefix = str(tmp_path / "mh")
    port = "29531"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), "2", port, REPO,
             str(fasta), str(bam), prefix, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker failed:\n{out.decode()[-2000:]}"
    merge_pileup_shards(prefix, 2)

    # byte-equal: merged shard BEDs match the single-process sid order
    for ctx in ("CpG", "CHG", "CHH"):
        a = open(f"{single_prefix}.{ctx}.cov.bed").read()
        b = open(f"{prefix}.{ctx}.cov.bed").read()
        assert a == b, f"{ctx} mismatch\n{outs}"


CALL_WORKER = """
import os, sys
pid = int(sys.argv[1])
n = int(sys.argv[2])
port = sys.argv[3]
repo = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=n, process_id=pid)
sys.path.insert(0, repo)
from hifimeth_tpu.engine.call import CallConfig, run_call
from hifimeth_tpu.parallel.dist import ShardSpec

in_bam, out_bam = sys.argv[5:7]
spec = ShardSpec(pid, n, batch_size=2)
cfg = CallConfig(site_batch=256, contexts=("CpG", "CHH"))
stats = run_call(in_bam, out_bam, cfg, cmdline="t", shard=spec)
print("worker", pid, "reads", stats["reads"], flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_call(tmp_path):
    """The production multi-host `call` entry (sharded run_call + shard BAM
    merge): two REAL jax.distributed CPU processes, round-robin ShardSpecs,
    merge_shard_bams - records byte-equal to the single-process run in the
    reference's global read order (mod_main.cpp:352-362)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from util import make_kinetics_read, write_bam

    from hifimeth_tpu.engine.call import CallConfig, run_call
    from hifimeth_tpu.io.bam import BamReader
    from hifimeth_tpu.parallel.dist import ShardSpec, merge_shard_bams, \
        shard_path

    rng = np.random.default_rng(61)
    recs = [make_kinetics_read(rng, f"r{i}", int(rng.integers(1200, 2200)))
            for i in range(10)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    single = tmp_path / "single.bam"
    run_call(str(in_bam), str(single),
             CallConfig(site_batch=256, contexts=("CpG", "CHH")), cmdline="t")

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(CALL_WORKER)
    out_base = str(tmp_path / "sharded.bam")
    port = "29537"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), "2", port, REPO,
             str(in_bam), out_base],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, f"worker failed:\n{out.decode()[-2000:]}"

    shards = [shard_path(out_base, ShardSpec(pid, 2)) for pid in range(2)]
    merged = tmp_path / "merged.bam"
    n = merge_shard_bams(str(merged), shards, batch_size=2)
    assert n == len(recs)

    want = [r.to_bytes() for r in BamReader(str(single))]
    got = [r.to_bytes() for r in BamReader(str(merged))]
    assert len(got) == len(want)
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"record {i} differs\n{outs}"
