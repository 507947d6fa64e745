"""Native I/O core (libbamcore.so) vs the Python implementations."""
import gzip

import numpy as np
import pytest

from hifimeth_tpu.io import native
from hifimeth_tpu.io.bgzf import BGZF_EOF, BgzfWriter

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libbamcore.so not built")


def test_bgzf_inflate_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 500_000, dtype=np.uint8).tobytes()
    p = tmp_path / "x.bgzf"
    w = BgzfWriter(p)
    w.write(data)
    w.close()
    comp = np.frombuffer(p.read_bytes(), np.uint8)
    payload, consumed = native.bgzf_inflate_buffer(comp)
    assert consumed == len(comp)
    assert payload == data + b""     # EOF block decompresses to nothing


def test_bgzf_inflate_partial_block(tmp_path):
    data = b"hello world" * 10000
    p = tmp_path / "x.bgzf"
    w = BgzfWriter(p)
    w.write(data)
    w.close()
    comp = np.frombuffer(p.read_bytes(), np.uint8)
    # truncate mid-final-block: consumed must stop at last complete block
    cut = comp[:-10]
    payload, consumed = native.bgzf_inflate_buffer(cut)
    assert consumed < len(cut)
    assert data.startswith(payload)


def test_bgzf_compress_is_valid_gzip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    comp = native.bgzf_compress_buffer(data, level=4)
    assert gzip.decompress(comp + BGZF_EOF) == data
    # and our own inflater round-trips it
    payload, consumed = native.bgzf_inflate_buffer(np.frombuffer(comp, np.uint8))
    assert payload == data


def test_seq_unpack_matches_python():
    from hifimeth_tpu.io.bam import BamRecord
    rng = np.random.default_rng(2)
    for l in (1, 2, 7, 100):
        seq = rng.choice(list(b"ACGTN"), l).astype(np.uint8)
        rec = BamRecord()
        rec.set_seq(seq)
        got = native.seq_unpack(rec.seq_nibbles, l)
        np.testing.assert_array_equal(got, rec.seq_ascii())


def test_revcomp_matches_python():
    from hifimeth_tpu.constants import BASE_COMPLEMENT
    rng = np.random.default_rng(3)
    seq = rng.choice(list(b"ACGTNacgt"), 999).astype(np.uint8)
    got = native.revcomp(seq)
    want = BASE_COMPLEMENT[seq[::-1]]
    np.testing.assert_array_equal(got, want)


def test_encode_codev1_matches_python():
    from hifimeth_tpu.constants import encode_frames_codev1
    frames = np.arange(0, 1500, dtype=np.uint16)
    got = native.encode_codev1(frames)
    np.testing.assert_array_equal(got, encode_frames_codev1(frames))


def test_scan_sites_matches_numpy():
    """Native single-pass scanner vs the vectorized numpy scans
    (eval_kmer_features.cpp:67-126 semantics)."""
    from hifimeth_tpu.features import sites as sf
    rng = np.random.default_rng(4)
    for L in (0, 1, 2, 3, 4, 50, 4096, 15001):
        seq = rng.choice(list(b"ACGTN"), L).astype(np.uint8)
        cpg, chg, chh, chs = native.scan_sites(seq)
        np.testing.assert_array_equal(cpg, sf.cpg_sites(seq))
        np.testing.assert_array_equal(chg, sf.chg_sites(seq))
        e_offs, e_str = sf.chh_sites(seq)
        np.testing.assert_array_equal(chh, e_offs)
        np.testing.assert_array_equal(chs, e_str)


def test_mm_deltas_matches_numpy():
    """Native MM skip-delta builder vs the cumsum/printf implementation
    (build_mod_bam.cpp:134-168 semantics)."""
    from hifimeth_tpu.io.mmtags import _delta_string
    rng = np.random.default_rng(5)
    for L in (4, 100, 15001):
        seq = rng.choice(list(b"ACGT"), L).astype(np.uint8)
        for base in b"CG":
            pos = np.flatnonzero(seq == base)
            if len(pos) == 0:
                continue
            q = np.sort(rng.choice(pos, max(1, len(pos) // 3),
                                   replace=False)).astype(np.int64)
            cum = np.zeros(L + 1, np.int64)
            np.cumsum(seq == base, out=cum[1:])
            assert native.mm_deltas(seq, base, q).decode() == \
                _delta_string(q, cum)
    # empty call list -> empty delta body
    assert native.mm_deltas(np.frombuffer(b"ACGT", np.uint8), ord("C"),
                            np.empty(0, np.int64)) == b""


def test_mm_deltas_rejects_off_base_call():
    seq = np.frombuffer(b"ACGT", np.uint8)
    with pytest.raises(ValueError):
        native.mm_deltas(seq, ord("C"), np.array([0], np.int64))  # 'A'


def test_scan_bed6_parity_and_errors():
    rows = (b"chr1\t10\t11\t50\t3\t3\n"
            b"chr1\t20\t21\t0\t0\t12\n"
            b"chr2\t5\t6\t100\t15\t0\n"
            b"chr1\t30\t31\t33.333\t1\t2\r\n"     # crlf + float freq
            b"short\trow\n"                        # <6 cols
            b"chr2\t7\t8\t0\t0\t9\n")
    names, chrid, start, end, pcov, ncov = native.scan_bed6(rows, True)
    assert names == ["chr1", "chr2", "chr1", "chr2"]
    np.testing.assert_array_equal(start, [10, 20, 5, 30, 7])
    np.testing.assert_array_equal(end, [11, 21, 6, 31, 8])
    np.testing.assert_array_equal(pcov, [3, 0, 15, 1, 0])
    np.testing.assert_array_equal(ncov, [3, 12, 0, 2, 9])
    np.testing.assert_array_equal(chrid, [0, 0, 1, 2, 3])
    with pytest.raises(ValueError):       # strict mode rejects short rows
        native.scan_bed6(rows, False)
    with pytest.raises(ValueError):       # malformed int always rejected
        native.scan_bed6(b"chr1\t1a\t2\t0\t1\t2\n", True)


def test_corr_native_matches_python(tmp_path):
    """load_bed_methy native path vs the per-line fallback."""
    from hifimeth_tpu.tools import corr as corr_mod
    rng = np.random.default_rng(6)
    lines = []
    for chrom in ("chr2", "chr1", "chr2"):  # non-adjacent runs share an id
        for _ in range(200):
            c = int(rng.integers(1, 20))
            p = int(rng.integers(0, c + 1))
            s = int(rng.integers(0, 10**6))
            lines.append(f"{chrom}\t{s}\t{s+1}\t{100*p/c:g}\t{p}\t{c-p}")
    lines.insert(5, "bad")                 # short row: skipped
    path = tmp_path / "x.bed"
    path.write_text("\n".join(lines) + "\n")
    m1, m2 = {}, {}
    k_nat, f_nat = corr_mod.load_bed_methy(str(path), 5, m1)
    orig = native._LIB
    try:
        native._LIB = False                # force the fallback
        k_py, f_py = corr_mod.load_bed_methy(str(path), 5, m2)
    finally:
        native._LIB = orig
    assert m1 == m2
    np.testing.assert_array_equal(k_nat, k_py)
    np.testing.assert_allclose(f_nat, f_py)


def test_bed_rows_single_row():
    """Regression (round-4 ADVICE): the output cap must satisfy the C
    per-row guard (chr_len+128 headroom), so 1-row calls — any (chr,motif)
    class with exactly one covered site — must not raise."""
    b = native.bed_rows("chr1", np.array([5], np.int32),
                        np.array([3], np.int32), np.array([4], np.int32))
    assert b == b"chr1\t5\t6\t75\t3\t1\n"
    b7 = native.bed_rows7("chr1", np.array([5], np.int32),
                          np.array([3], np.int32), np.array([4], np.int32),
                          np.array([0], np.uint8), ["CAG"])
    assert b7 == b"chr1\t5\t6\t75\t3\t1\tCAG\n"


def test_scan_bed6_many_chr_runs():
    """Regression (round-4 ADVICE): >64Ki chr runs (fragmented assemblies)
    must grow the name table instead of failing as 'corrupted'."""
    n = (1 << 16) + 10
    rows = b"".join(b"ctg%d\t1\t2\t100\t1\t0\n" % i for i in range(n))
    names, chrid, start, end, pcov, ncov = native.scan_bed6(rows, False)
    assert len(names) == n
    assert names[0] == "ctg0" and names[-1] == "ctg%d" % (n - 1)
    np.testing.assert_array_equal(chrid, np.arange(n))


def test_plan_groups_fast_matches_numpy():
    """Native group planning vs ops/gather.plan_groups, both the no-split
    path (idx None) and the greedy span-splitting path (idx mapping), with
    the engine's b128 alignment adjustment applied to the numpy result."""
    from hifimeth_tpu.ops.gather import CHUNK_LANES, plan_groups
    rng = np.random.default_rng(9)
    G, BL, n_rows = 32, 2048, 1 << 21
    ext = CHUNK_LANES + 127

    def check(starts):
        got = native.plan_groups_fast(starts, G, BL, ext, n_rows)
        assert got is not None
        nb, nr, nidx = got
        bases, rels, idx = plan_groups(starts, G, BL, 401, n_rows,
                                       extent=ext)
        b128 = (bases // 128) * 128
        rels = rels + (bases - b128)[:, None]
        np.testing.assert_array_equal(nb, b128)
        if idx is None:
            assert nidx is None
            # pad slots may duplicate a different real site of the group;
            # only real slots must agree
            n = len(starts)
            np.testing.assert_array_equal(nr.reshape(-1)[:n],
                                          rels.reshape(-1)[:n])
        else:
            # compare via the scatter both implementations feed: starts
            # recovered per input position must agree slot-for-slot
            n = len(starts)
            a = np.empty(n, np.int64)
            a[nidx.reshape(-1)] = (nr + nb[:, None]).reshape(-1)
            b = np.empty(n, np.int64)
            b[idx.reshape(-1)] = (rels + nb[:, None] if False else
                                  rels + b128[:, None]).reshape(-1)
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, starts)

    # dense: no splits
    check(np.sort(rng.integers(400, n_rows - 3000, 5000)).astype(np.int32))
    # sparse stretches force greedy splits (sites > cap apart)
    sparse = np.sort(np.concatenate([
        rng.integers(400, 20000, 200),
        rng.integers(200000, 210000, 50),
        np.arange(500000, 500000 + 40 * 4096, 4096),
    ])).astype(np.int32)
    check(sparse)


def test_map_mod_sites_debug_align_selfcheck():
    """HIFIMETH_DEBUG_ALIGN=1 enables the runtime column self-check in
    hm_map_mod_sites (reference parity: hbn_assert on every alignment
    column, bam_info.cpp:399-416).  The flag is latched at the first call
    per process, so run in a subprocess; valid input must produce results
    identical to the unchecked path."""
    import os
    import subprocess
    import sys

    code = r"""
import numpy as np
from hifimeth_tpu.io import native

rng = np.random.default_rng(5)
chrseq = rng.choice(list(b"ACGT"), 500).astype(np.uint8)
query = np.concatenate([chrseq[100:150], [ord("A")], chrseq[150:200]])
ops = np.array([0, 1, 0], np.uint8)          # 50M 1I 50M
lens = np.array([50, 1, 50], np.int32)
has = np.ones(len(query), np.uint8)
prob = rng.integers(0, 256, len(query)).astype(np.uint8)
r = native.map_mod_sites(query, 0, chrseq, 100, ops, lens, has, prob)
assert r is not None
pi, epi, soffs, probs, motifs = r
assert pi > 90.0
print("OK", len(soffs), round(pi, 3))
"""
    env = dict(os.environ)
    base = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                          env=env, capture_output=True, text=True)
    assert base.returncode == 0, base.stderr
    env["HIFIMETH_DEBUG_ALIGN"] = "1"
    checked = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                             env=env, capture_output=True, text=True)
    assert checked.returncode == 0, checked.stderr
    assert checked.stdout == base.stdout
