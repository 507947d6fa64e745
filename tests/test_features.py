import numpy as np
import pytest

from hifimeth_tpu.constants import FWD, REV, IUPACNA_TO_CODE
from hifimeth_tpu.features import sites
from hifimeth_tpu.features.extract import extract_site_features
from hifimeth_tpu.features.read_decode import DecodedRead


def brute_force_sites(seq: bytes):
    """Straight transliteration of the reference scan loops for testing."""
    s = seq.decode()
    L = len(s)
    cpg = [i for i in range(L - 1) if s[i:i + 2] == "CG"]
    chg = [i for i in range(L - 2) if s[i:i + 2 + 1][:3] in ("CCG", "CAG", "CTG")]
    fwd_chh = {"C" + a + b for a in "ACT" for b in "ACT"}
    rev_chh = {"TTG", "TGG", "TAG", "GTG", "GGG", "GAG", "ATG", "AGG", "AAG"}
    chh = []
    for i in range(L - 2):
        tri = s[i:i + 3]
        if tri in fwd_chh:
            chh.append((i, FWD))
        elif tri in rev_chh:
            chh.append((i + 2, REV))
    # the reference emits CHH in scan order of i (rev hits land at i+2, so
    # offsets interleave); chh_sites emits position-sorted - an equivalent
    # contract since all consumers re-sort by qoff.  Offsets are unique
    # (fwd on C, rev on G), so sorting by offset is a total order.
    chh.sort()
    return cpg, chg, chh


@pytest.mark.parametrize("seed", range(5))
def test_site_discovery_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    seq = rng.choice(list(b"ACGTN" if seed % 2 else b"ACGT"),
                     int(rng.integers(10, 500))).astype(np.uint8)
    cpg, chg, chh = brute_force_sites(seq.tobytes())
    assert list(sites.cpg_sites(seq)) == cpg
    assert list(sites.chg_sites(seq)) == chg
    offs, strands = sites.chh_sites(seq)
    assert list(zip(offs.tolist(), strands.tolist())) == chh


def test_contexts_are_disjoint():
    rng = np.random.default_rng(3)
    seq = rng.choice(list(b"ACGT"), 2000).astype(np.uint8)
    cpg = set(sites.cpg_sites(seq).tolist())
    chg = set(sites.chg_sites(seq).tolist())
    chh = set(sites.chh_sites(seq)[0].tolist())
    assert not (cpg & chg) and not (cpg & chh) and not (chg & chh)


def _random_read(rng, L):
    seq = rng.choice(list(b"ACGT"), L).astype(np.uint8)
    return DecodedRead(
        seq=seq,
        codes=IUPACNA_TO_CODE[seq],
        fi=rng.integers(0, 256, L).astype(np.uint8),
        fp=rng.integers(0, 256, L).astype(np.uint8),
        ri=rng.integers(0, 256, L).astype(np.uint8),
        rp=rng.integers(0, 256, L).astype(np.uint8),
    )


def scalar_reference_features(read: DecodedRead, off: int, strand: int,
                              kmer=401):
    """Direct per-site transliteration of s_extract_kmer_features
    (eval_kmer_features.cpp:9-65) for cross-checking the vectorized paths.
    Note read.ri/rp are already re-indexed to fwd coords (read_decode.py), so
    rev-strand-coord access at index i is read.ri[size-1-i]."""
    from hifimeth_tpu.constants import CODEV1_TO_FRAME_NORM as T
    L = read.size
    F = np.zeros((kmer, 8), np.float32)
    hk = kmer // 2
    if strand == FWD:
        seqc = read.codes
        o = off
        same_ipd = lambda i: T[read.fi[i]]
        same_pw = lambda i: T[read.fp[i]]
        opp_ipd = lambda i: T[read.ri[L - 1 - (L - 1 - i)]]  # rev arr at rev coord L-1-i
        opp_pw = lambda i: T[read.rp[i]]
    else:
        seqc = np.where(read.codes < 4, 3 - read.codes, read.codes)[::-1]
        o = L - 1 - off
        # strand-local index i is a rev coord; rev kinetics at rev coord i is
        # read.ri[L-1-i] (fwd-indexed plane); opposite (fwd) at fwd coord L-1-i.
        same_ipd = lambda i: T[read.ri[L - 1 - i]]
        same_pw = lambda i: T[read.rp[L - 1 - i]]
        opp_ipd = lambda i: T[read.fi[L - 1 - i]]
        opp_pw = lambda i: T[read.fp[L - 1 - i]]
    qfrom = max(0, o - hk)
    qto = min(L, o + hk + 1)
    fi = (hk - o) if hk > o else 0
    for i in range(qfrom, qto):
        c = seqc[i]
        if c < 4:
            F[fi, c] = 1.0
        F[fi, 4] = same_ipd(i)
        F[fi, 5] = same_pw(i)
        F[fi, 6] = opp_ipd(i)
        F[fi, 7] = opp_pw(i)
        fi += 1
    return F


@pytest.mark.parametrize("L,offs_strands", [
    (500, [(250, FWD), (250, REV), (0, FWD), (499, REV), (10, REV), (490, FWD)]),
    (100, [(0, FWD), (99, REV), (50, FWD), (50, REV)]),  # shorter than kmer
])
def test_host_features_match_scalar_reference(L, offs_strands):
    rng = np.random.default_rng(11)
    read = _random_read(rng, L)
    offs = np.array([o for o, _ in offs_strands])
    strands = np.array([s for _, s in offs_strands], np.uint8)
    got = extract_site_features(read, offs, strands)
    for k, (o, st) in enumerate(offs_strands):
        want = scalar_reference_features(read, o, st)
        np.testing.assert_array_equal(got[k], want,
                                      err_msg=f"site {o} strand {st}")


def test_device_features_match_host():
    import jax.numpy as jnp
    from hifimeth_tpu.features.windows import featurize_planes, gather_windows

    rng = np.random.default_rng(5)
    reads = [_random_read(rng, int(rng.integers(60, 700))) for _ in range(5)]
    planes = np.concatenate(
        [np.stack([r.codes, r.fi, r.fp, r.ri, r.rp]) for r in reads], axis=1)
    starts = np.cumsum([0] + [r.size for r in reads])

    centers, strands, rstart, rend, want = [], [], [], [], []
    for ri, r in enumerate(reads):
        offs = np.array([0, r.size // 3, r.size - 1])
        sts = np.array([FWD, REV, REV], np.uint8)
        feats = extract_site_features(r, offs, sts)
        for k in range(len(offs)):
            centers.append(starts[ri] + offs[k])
            strands.append(sts[k])
            rstart.append(starts[ri])
            rend.append(starts[ri + 1])
            want.append(feats[k])

    table = featurize_planes(jnp.asarray(planes))
    got = gather_windows(table,
                         jnp.asarray(np.array(centers, np.int32)),
                         jnp.asarray(np.array(strands)),
                         jnp.asarray(np.array(rstart, np.int32)),
                         jnp.asarray(np.array(rend, np.int32)))
    np.testing.assert_array_equal(np.asarray(got), np.stack(want))


def test_codev1_arithmetic_decode_matches_table():
    """The TPU featurize path decodes codeV1 arithmetically
    (windows._codev1_norm).  The piecewise-linear integer form must equal
    the decode table exactly (bam_info.cpp:562-570), leaving the final
    divide's 1-ulp rounding as the only possible device deviation from the
    host table (absorbed by the +/-1-u8 scaled-prob contract)."""
    from hifimeth_tpu.constants import CODEV1_TO_FRAME
    c = np.arange(256, dtype=np.float64)
    v = np.where(c < 64, c,
                 np.where(c < 128, 2 * c - 64,
                          np.where(c < 192, 4 * c - 320, 8 * c - 1088)))
    np.testing.assert_array_equal(v, CODEV1_TO_FRAME)
