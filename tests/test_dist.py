"""Multi-host sharding: shard assignment, shard call + merge round-trip, and
multi-chip data-parallel call equivalence."""
import numpy as np

from hifimeth_tpu.engine.call import CallConfig, run_call
from hifimeth_tpu.io.bam import BamReader
from hifimeth_tpu.parallel.dist import (ShardSpec, chromosome_ranges,
                                        merge_shard_bams, shard_path)

from util import make_kinetics_read, write_bam


def test_shard_assignment():
    spec0 = ShardSpec(0, 3, batch_size=10)
    spec1 = ShardSpec(1, 3, batch_size=10)
    owners = [(r // 10) % 3 for r in range(100)]
    for r in range(100):
        assert spec0.owns_read(r) == (owners[r] == 0)
        assert spec1.owns_read(r) == (owners[r] == 1)
    # every read owned by exactly one process
    for r in range(100):
        assert sum(ShardSpec(p, 3, 10).owns_read(r) for p in range(3)) == 1


def test_chromosome_ranges():
    assert chromosome_ranges(5, ShardSpec(0, 2)) == [0, 2, 4]
    assert chromosome_ranges(5, ShardSpec(1, 2)) == [1, 3]
    assert chromosome_ranges(3, ShardSpec(0, 1)) == [0, 1, 2]


def test_sharded_call_and_merge_equals_single(tmp_path):
    rng = np.random.default_rng(0)
    recs = [make_kinetics_read(rng, f"r{i}", int(rng.integers(1100, 1400)))
            for i in range(13)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    cfg = CallConfig(contexts=("CpG",), site_batch=128)
    # single-process reference output
    single = tmp_path / "single.bam"
    run_call(str(in_bam), str(single), cfg)

    # 3 simulated hosts with small round-robin blocks
    n_proc = 3
    out_base = str(tmp_path / "out.bam")
    shard_paths = []
    for pid in range(n_proc):
        spec = ShardSpec(pid, n_proc, batch_size=2)
        run_call(str(in_bam), out_base, cfg, shard=spec)
        shard_paths.append(shard_path(out_base, spec))

    merged = tmp_path / "merged.bam"
    n = merge_shard_bams(str(merged), shard_paths, batch_size=2)
    assert n == len(recs)

    a = list(BamReader(single))
    b = list(BamReader(merged))
    assert [r.qname for r in a] == [r.qname for r in b]
    for ra, rb in zip(a, b):
        assert ra.get_tag("MM") == rb.get_tag("MM")
        ta, tb = ra.get_tag("ML"), rb.get_tag("ML")
        assert np.array_equal(ta[1][1], tb[1][1])


def test_data_parallel_call_matches_single(tmp_path):
    import jax
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(1)
    recs = [make_kinetics_read(rng, f"r{i}", 1500) for i in range(6)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    base = CallConfig(contexts=("CpG", "CHH"), site_batch=256)
    single = tmp_path / "single.bam"
    run_call(str(in_bam), str(single), base)

    dp_cfg = CallConfig(contexts=("CpG", "CHH"), site_batch=256,
                        data_parallel=True)
    dp = tmp_path / "dp.bam"
    run_call(str(in_bam), str(dp), dp_cfg)

    a = list(BamReader(single))
    b = list(BamReader(dp))
    for ra, rb in zip(a, b):
        assert ra.get_tag("MM") == rb.get_tag("MM")
        pa = ra.get_tag("ML")[1][1].astype(int)
        pb = rb.get_tag("ML")[1][1].astype(int)
        assert np.abs(pa - pb).max() <= 1


def test_data_parallel_pallas_bitequal_single(tmp_path):
    """The production TPU gather under --data-parallel: the group-fetch
    pallas path sharded over an 8-device mesh (shard_map,
    call_sites_pallas_dp) must be BIT-equal to the single-device pallas
    path - the multi-chip story scales the fast kernel, it does not
    downgrade to the slice gather."""
    import jax
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(5)
    recs = [make_kinetics_read(rng, f"r{i}", 1200 + 111 * i)
            for i in range(7)]
    in_bam = tmp_path / "in.bam"
    write_bam(in_bam, recs)

    # flush_bases < read size forces several fill-through flushes, so the
    # segment-aligned defer cut (round 5) runs against the mesh-replicated
    # segment payload too, not just single-device
    base = CallConfig(site_batch=128, gather_impl="pallas",
                      buffer_bases=1 << 15, flush_bases=3000)
    single = tmp_path / "single.bam"
    run_call(str(in_bam), str(single), base)

    dp_cfg = CallConfig(site_batch=128, gather_impl="pallas",
                        buffer_bases=1 << 15, flush_bases=3000,
                        data_parallel=True)
    dp = tmp_path / "dp.bam"
    run_call(str(in_bam), str(dp), dp_cfg)

    a = list(BamReader(single))
    b = list(BamReader(dp))
    assert [r.qname for r in a] == [r.qname for r in b]
    for ra, rb in zip(a, b):
        assert ra.get_tag("MM") == rb.get_tag("MM")
        np.testing.assert_array_equal(ra.get_tag("ML")[1][1],
                                      rb.get_tag("ML")[1][1])


def test_sharded_pileup_matches_single(tmp_path):
    """2-process pileup simulation: sharded pass 1 + psum-style bins merge +
    chromosome-range pass 2 + shard concat == single-process output."""
    from hifimeth_tpu.quant.pileup import merge_pileup_shards, run_pileup
    from test_pileup import make_mapped_mod_bam

    rng = np.random.default_rng(9)
    fasta, bam, chroms, recs = make_mapped_mod_bam(tmp_path, rng, n_reads=30)

    single_prefix = str(tmp_path / "single")
    sres = run_pileup(str(fasta), str(bam), single_prefix,
                      spill_dir=str(tmp_path))

    # harvest per-shard local bins + spill files
    n_proc = 2
    harvest = []
    for pid in range(n_proc):
        spec = ShardSpec(pid, n_proc, batch_size=3)
        r = run_pileup(str(fasta), str(bam), str(tmp_path / f"h{pid}"),
                       spill_dir=str(tmp_path), shard=spec, keep_spill=True)
        harvest.append(r)
    global_bins = harvest[0]["bins"] + harvest[1]["bins"]
    np.testing.assert_array_equal(global_bins, sres["bins"])

    # final sharded runs with the collective-merged bins and all spills
    shard_prefix = str(tmp_path / "sh")
    for pid in range(n_proc):
        spec = ShardSpec(pid, n_proc, batch_size=3)
        other = harvest[1 - pid]["spill_path"]
        run_pileup(str(fasta), str(bam), shard_prefix,
                   spill_dir=str(tmp_path), shard=spec,
                   bins_reduce=lambda local: global_bins,
                   extra_spill_paths=[other])
    merge_pileup_shards(shard_prefix, n_proc)

    # byte-equal to the single-process output: merge interleaves shard files
    # back into global sid order (pileup.cpp:513-595 contract)
    for ctx in ("CpG", "CHG", "CHH"):
        a = open(f"{single_prefix}.{ctx}.cov.bed").read()
        b = open(f"{shard_prefix}.{ctx}.cov.bed").read()
        assert a == b, f"{ctx} mismatch"
