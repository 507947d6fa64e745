"""SAM base-modification (MM/ML/MN) tag writer and tolerant parser.

Writer replicates /root/reference/src/corelib/build_mod_bam.cpp:125-248:
 - strips kinetics tags (fi/ri/fp/rp) unless keep_kinetics, always strips any
   pre-existing MM/ML
 - MM:Z:C+m,<deltas>;G-m,<deltas>; where each delta counts *skipped*
   same-base positions on the native forward strand
 - ML:B:C with forward-call probs followed by reverse-call probs
 - MN:i:<l_seq> with htslib's smallest-int-type encoding

Parser replicates /root/reference/src/corelib/bam_mod_parser.cpp: tolerant of
general SAM basemod syntax (ChEBI codes, '.'/'?' flags, multi-code series),
validating base/code combinations, and converting skip-deltas back to
native-forward offsets.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_DELTA_BODY_RE = re.compile(r"\d+(?:,\d+)*")

from .bam import BamRecord, choose_int_type
from ..constants import FWD, REV

KINETICS_TAGS = ("fi", "ri", "fp", "rp")

_CHEBI_TO_CODE = {
    27551: "m", 76792: "h", 76794: "f", 76793: "c", 16964: "g",
    80961: "e", 17477: "b", 28871: "a", 44605: "o", 18107: "n",
}

# code -> allowed unmodified bases (bam_mod_parser.cpp:98-134)
_CODE_BASES = {}
for _c in "mhfc":
    _CODE_BASES[_c] = {"C", "G"}
_CODE_BASES["C"] = {"C", "G"}
for _c in "geb":
    _CODE_BASES[_c] = {"T", "A"}
_CODE_BASES["T"] = {"T", "A"}
_CODE_BASES["U"] = {"U"}
_CODE_BASES["a"] = _CODE_BASES["A"] = {"A", "T"}
_CODE_BASES["o"] = _CODE_BASES["G"] = {"G", "C"}
_CODE_BASES["n"] = _CODE_BASES["N"] = {"N"}


class ModTagError(ValueError):
    pass


def _delta_string(qoffs: np.ndarray, base_positions_cum: np.ndarray) -> str:
    """Build ',d0,d1,...' for calls at qoffs given cumsum of same-base mask.

    base_positions_cum[i] = number of same-base chars in fwd_seq[0:i].
    delta_0 = #base in [0, qoff_0); delta_i = #base in [prev_qoff+1, qoff_i).
    Since each qoff sits on the base itself this equals consecutive-rank
    differences minus one.
    """
    if len(qoffs) == 0:
        return ""
    ranks = base_positions_cum[qoffs]  # rank of each call among same-base chars
    deltas = np.empty(len(qoffs), dtype=np.int64)
    deltas[0] = ranks[0]
    deltas[1:] = np.diff(ranks) - 1
    # printf-style tuple formatting is ~4x faster than a join of str() calls
    return (",%d" * len(deltas)) % tuple(deltas.tolist())


def build_mod_tags(rec: BamRecord, fwd_seq: np.ndarray,
                   fwd_qoffs: np.ndarray, fwd_probs: np.ndarray,
                   rev_qoffs: np.ndarray, rev_probs: np.ndarray,
                   keep_kinetics: bool = False) -> None:
    """Attach MM/ML/MN to a record (reference: build_mod_bam.cpp:125-248).

    fwd_seq is the read's native-forward ASCII sequence; fwd_qoffs must sit on
    'C' and rev_qoffs on 'G' (native-forward coordinates), both sorted
    ascending.  Probabilities are u8 scaled probs.
    """
    if not keep_kinetics:
        for t in KINETICS_TAGS:
            rec.del_tag(t)
    rec.del_tag("ML")
    rec.del_tag("MM")
    if len(fwd_qoffs) == 0 and len(rev_qoffs) == 0:
        return

    from . import native
    if native.available() and getattr(native._load(), "hm_mm_deltas", None):
        # native single-pass delta builder (~10x the cumsum + printf path)
        fwd_d = native.mm_deltas(fwd_seq, ord("C"), fwd_qoffs).decode()
        rev_d = native.mm_deltas(fwd_seq, ord("G"), rev_qoffs).decode()
        mm = "C+m" + fwd_d + ";G-m" + rev_d + ";"
    else:
        cum_c = np.zeros(len(fwd_seq) + 1, dtype=np.int64)
        np.cumsum(fwd_seq == ord("C"), out=cum_c[1:])
        cum_g = np.zeros(len(fwd_seq) + 1, dtype=np.int64)
        np.cumsum(fwd_seq == ord("G"), out=cum_g[1:])
        mm = ("C+m" + _delta_string(np.asarray(fwd_qoffs, np.int64), cum_c) + ";"
              + "G-m" + _delta_string(np.asarray(rev_qoffs, np.int64), cum_g)
              + ";")
    ml = np.concatenate([
        np.asarray(fwd_probs, np.uint8), np.asarray(rev_probs, np.uint8)
    ])
    rec.set_tag("MM", "Z", mm)
    rec.set_tag("ML", "B", ("C", ml))
    rec.set_tag("MN", choose_int_type(rec.l_seq), rec.l_seq)


@dataclass
class BaseModSeries:
    unmod_base: str
    strand: int          # observed strand: FWD for '+', REV for '-'
    codes: str
    qoffs: np.ndarray    # native-forward offsets, one per delta
    probs: np.ndarray    # (n_deltas, n_codes) u8


def parse_mod_tags(rec: BamRecord, fwd_seq: np.ndarray) -> list[BaseModSeries]:
    """Parse MM/ML into per-series native-forward offsets + probabilities.

    Follows bam_mod_parser.cpp:231-286 / 136-229: returns [] when ML is
    missing/empty or MM is absent; raises ModTagError on malformed input.
    """
    ml = rec.get_tag("ML")
    if ml is None:
        return []
    _, (sub, probs_raw) = ml
    probs = np.asarray(probs_raw)
    if probs.size and (probs.min() < 0 or probs.max() > 255):
        raise ModTagError(
            f"read {rec.qname}: illegal scaled probability outside [0,255]")
    probs = probs.astype(np.uint8)
    if probs.size == 0:
        return []
    mm = rec.get_tag("MM")
    if mm is None:
        return []
    mms = mm[1]
    if not mms.endswith(";"):
        raise ModTagError(f"read {rec.qname}: MM tag must end with ';'")

    # Pre-compute positions of each possible unmod base on the fwd strand.
    base_pos_cache: dict[str, np.ndarray] = {}

    def base_positions(b: str) -> np.ndarray:
        if b not in base_pos_cache:
            base_pos_cache[b] = np.flatnonzero(fwd_seq == ord(b))
        return base_pos_cache[b]

    series_out: list[BaseModSeries] = []
    prob_idx = 0
    for series in _split_series(mms):
        unmod_base, strand, codes, deltas = _parse_one_series(rec.qname, series)
        n = len(deltas)
        ncodes = len(codes)
        if n == 0:
            series_out.append(BaseModSeries(
                unmod_base, strand, codes,
                np.empty(0, np.int64), np.empty((0, ncodes), np.uint8)))
            continue
        pos = base_positions(unmod_base)
        # skip-delta walk: rank_i = cumulative(deltas + 1) - 1
        ranks = np.cumsum(np.asarray(deltas, np.int64) + 1) - 1
        if len(pos) == 0 or ranks[-1] >= len(pos):
            raise ModTagError(
                f"read {rec.qname}: MM series {unmod_base}{'+-'[strand]}{codes} "
                f"walks past the end of the read")
        qoffs = pos[ranks]
        need = n * ncodes
        if prob_idx + need > len(probs):
            raise ModTagError(f"read {rec.qname}: ML array shorter than MM calls")
        p = probs[prob_idx:prob_idx + need].reshape(n, ncodes)
        prob_idx += need
        series_out.append(BaseModSeries(unmod_base, strand, codes, qoffs, p))
    return series_out


def parse_mod_tags_flat(rec: BamRecord, fwd_seq: np.ndarray):
    """Flattened (qoffs, strands, codes, probs) over all series, in MM order.

    Matches the BaseModInfo stream the reference produces
    (bam_mod_parser.hpp BaseModInfo)."""
    qoffs, strands, codes, probs = [], [], [], []
    for s in parse_mod_tags(rec, fwd_seq):
        for j, code in enumerate(s.codes):
            qoffs.append(s.qoffs)
            strands.append(np.full(len(s.qoffs), s.strand, np.uint8))
            codes.append(np.full(len(s.qoffs), ord(code), np.uint8))
            probs.append(s.probs[:, j])
    if not qoffs:
        z = np.empty(0, np.int64)
        return z, z.astype(np.uint8), z.astype(np.uint8), z.astype(np.uint8)
    return (np.concatenate(qoffs), np.concatenate(strands),
            np.concatenate(codes), np.concatenate(probs))


def _split_series(mms: str) -> list[str]:
    out = []
    i = 0
    n = len(mms)
    while i < n:
        j = mms.index(";", i + 1)
        out.append(mms[i:j + 1])
        i = j + 1
    return out


def _parse_one_series(qname: str, s: str):
    if len(s) < 4 or not s.endswith(";"):
        raise ModTagError(f"read {qname}: corrupted MM edit series {s!r}")
    unmod_base = s[0]
    if unmod_base not in "CGTAUN":
        raise ModTagError(
            f"read {qname}: unrecognised unmodified base {unmod_base!r} in {s!r}")
    if s[1] not in "+-":
        raise ModTagError(f"read {qname}: unrecognised strand {s[1]!r} in {s!r}")
    strand = FWD if s[1] == "+" else REV

    codes = ""
    i = 2
    if s[i].isdigit():
        c = 0
        while i < len(s) and s[i].isdigit():
            c = c * 10 + int(s[i])
            i += 1
        if i >= len(s) or s[i] != ",":
            raise ModTagError(f"read {qname}: illegal ChEBI edit series {s!r}")
        if c not in _CHEBI_TO_CODE:
            raise ModTagError(f"read {qname}: unrecognised ChEBI code {c} in {s!r}")
        codes = _CHEBI_TO_CODE[c]
    else:
        while i < len(s) and s[i] not in ",;":
            if s[i] not in ".?":
                codes += s[i]
            i += 1

    for c in codes:
        if c in _CODE_BASES and unmod_base not in _CODE_BASES[c]:
            raise ModTagError(
                f"read {qname}: inconsistent unmod base {unmod_base!r} and "
                f"modification code {c!r} in {s!r}")

    body = s[i:-1]
    if body.startswith(",") or body.startswith(";"):
        body = body[1:]
    if not body:
        return unmod_base, strand, codes, np.empty(0, np.int64)
    from . import native
    if native.available() and getattr(native._load(), "hm_parse_deltas", None):
        try:  # native validate+parse in one pass
            return (unmod_base, strand, codes,
                    native.parse_deltas(body.encode()).astype(np.int64))
        except ValueError:
            raise ModTagError(f"read {qname}: illegal character in {s!r}")
    # one C-level regex validation + one vectorized parse instead of a
    # per-token isdigit/int loop (the MM parser dominated pileup pass 1)
    if not _DELTA_BODY_RE.fullmatch(body):
        raise ModTagError(f"read {qname}: illegal character in {s!r}")
    return unmod_base, strand, codes, np.array(body.split(","), np.int64)
