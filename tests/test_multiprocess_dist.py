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
