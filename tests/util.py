"""Synthetic BAM fixtures for tests."""
import numpy as np

from hifimeth_tpu.io.bam import BamHeader, BamRecord, BamWriter

COMP = dict(zip(b"ACGTN", b"TGCAN"))


def revcomp_bytes(seq: bytes) -> bytes:
    return bytes(COMP[b] for b in seq[::-1])


def make_kinetics_read(rng, name: str, length: int, flag: int = 4,
                       raw_frames: bool = False) -> BamRecord:
    """Unmapped HiFi-like read with fi/ri/fp/rp kinetics tags.

    With raw_frames=True the kinetics are stored as raw frame counts (B,S),
    exercising the codeV1 re-encode path (bam_info.cpp:455-478).
    """
    rec = BamRecord(qname=name, flag=flag)
    seq = rng.choice(list(b"ACGT"), length).astype(np.uint8)
    if flag & 16:
        stored = np.frombuffer(revcomp_bytes(seq.tobytes()), np.uint8)
    else:
        stored = seq
    rec.set_seq(stored, qual=rng.integers(20, 60, length).astype(np.uint8))
    rec._native_fwd = seq  # test-side convenience
    for tag in ("fi", "ri", "fp", "rp"):
        if raw_frames:
            arr = rng.integers(0, 1200, length).astype(np.uint16)
            rec.set_tag(tag, "B", ("S", arr))
        else:
            arr = rng.integers(0, 256, length).astype(np.uint8)
            rec.set_tag(tag, "B", ("C", arr))
    rec.set_tag("fn", "C", int(rng.integers(1, 20)))
    rec.set_tag("rn", "C", int(rng.integers(1, 20)))
    return rec


def write_bam(path, records, refs=None, text="@HD\tVN:1.6\tSO:unknown\n"):
    hdr = BamHeader(text, refs or [])
    with BamWriter(path, hdr) as w:
        for r in records:
            w.write(r)
    return hdr
