"""Candidate 5mC site discovery on the native-forward read.

Vectorized numpy replication of the reference scans, including their
asymmetries (eval_kmer_features.cpp:67-126):
 - CpG: forward-strand 'CG' positions only
 - CHG: forward-strand CCG/CAG/CTG positions only (NO reverse-strand CHG at
   read level)
 - CHH: forward motif hits (C[ACT][ACT]) at i, plus reverse motif hits
   ([TGA][TGA]G) recorded at the G (i+2), in scan order
"""
from __future__ import annotations

import numpy as np

from ..constants import FWD, REV

_A, _C, _G, _T = (ord(c) for c in "ACGT")

_IS_H = np.zeros(256, dtype=bool)       # H = A/C/T
for _c in (_A, _C, _T):
    _IS_H[_c] = True
_IS_D = np.zeros(256, dtype=bool)       # D = A/G/T (complement of H)
for _c in (_A, _G, _T):
    _IS_D[_c] = True


def cpg_sites(seq: np.ndarray) -> np.ndarray:
    """Forward-strand CpG offsets (eval_kmer_features.cpp:89-102)."""
    if len(seq) < 2:
        return np.empty(0, np.int64)
    return np.flatnonzero((seq[:-1] == _C) & (seq[1:] == _G))


def chg_sites(seq: np.ndarray) -> np.ndarray:
    """Forward-strand CHG (CCG/CAG/CTG) offsets (eval_kmer_features.cpp:104-126)."""
    if len(seq) < 3:
        return np.empty(0, np.int64)
    return np.flatnonzero(
        (seq[:-2] == _C) & _IS_H[seq[1:-1]] & (seq[2:] == _G))


def chh_sites(seq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """CHH offsets and strands in scan order (eval_kmer_features.cpp:67-87).

    Returns (offsets, strands): forward-motif hits contribute offset i with
    FWD; reverse-motif hits contribute offset i+2 with REV.  A 3-mer cannot
    match both (fwd needs C at i, rev needs T/G/A at i).
    """
    if len(seq) < 3:
        z = np.empty(0, np.int64)
        return z, z.astype(np.uint8)
    fwd = (seq[:-2] == _C) & _IS_H[seq[1:-1]] & _IS_H[seq[2:]]
    rev = _IS_D[seq[:-2]] & _IS_D[seq[1:-1]] & (seq[2:] == _G)
    hit = fwd | rev
    idx = np.flatnonzero(hit)
    offs = idx + np.where(fwd[idx], 0, 2)
    strands = np.where(fwd[idx], FWD, REV).astype(np.uint8)
    return offs, strands


def site_strands_for_c_or_g(seq: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Strand by modified-base identity ('C'->FWD, 'G'->REV;
    eval_kmer_features.cpp:25-35)."""
    return np.where(seq[offs] == _C, FWD, REV).astype(np.uint8)
