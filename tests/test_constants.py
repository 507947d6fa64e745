import numpy as np

from hifimeth_tpu import constants as C


def test_codev1_table_matches_spec():
    # piecewise-linear segments from the PacBio codec v1 spec
    # (sample_dataset.py:19-51, bam_info.cpp:562-570)
    t = C.CODEV1_TO_FRAME
    assert t[0] == 0 and t[63] == 63
    assert t[64] == 64 and t[127] == 190
    assert t[128] == 192 and t[191] == 444
    assert t[192] == 448 and t[255] == 952
    assert t.max() == C.MAX_KINETIC_VALUE


def test_codev1_encode_decode_roundtrip():
    # every code decodes then re-encodes to itself
    codes = np.arange(256, dtype=np.uint8)
    frames = C.CODEV1_TO_FRAME[codes]
    assert np.array_equal(C.encode_frames_codev1(frames), codes)


def test_codev1_encode_matches_reference_segments():
    # spot values from s_encode_signal_value (bam_info.cpp:455-478)
    f = C.encode_frames_codev1
    assert f(np.array([0]))[0] == 0
    assert f(np.array([63]))[0] == 63
    assert f(np.array([64]))[0] == 64
    assert f(np.array([65]))[0] == 64     # truncation inside segment
    assert f(np.array([191]))[0] == 127
    assert f(np.array([192]))[0] == 128
    assert f(np.array([447]))[0] == 191
    assert f(np.array([448]))[0] == 192
    assert f(np.array([952]))[0] == 255
    assert f(np.array([100000]))[0] == 255  # clamped at 952


def test_base_codes():
    for ch, code in (("A", 0), ("C", 1), ("G", 2), ("T", 3), ("N", 14)):
        assert C.IUPACNA_TO_CODE[ord(ch)] == code
        assert C.IUPACNA_TO_CODE[ord(ch.lower())] == code
    assert C.IUPACNA_TO_CODE[ord("!")] == 15


def test_motif_tables():
    # CHG/CHH motif sets (5mc_context.cpp:3-10)
    assert C.motif_hash("CG") == (1 << 2) | 2
    assert len(C.FWD_CHH_HASHES) == 9
    assert len(C.REV_CHH_HASHES) == 9
    # rev motifs are reverse complements of the fwd motifs
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = lambda m: "".join(comp[c] for c in reversed(m))
    assert {rc(m) for m in C.FWD_CHH_MOTIFS} == set(C.REV_CHH_MOTIFS)
    assert {rc(m) for m in C.FWD_CHG_MOTIFS} == set(C.REV_CHG_MOTIFS)
