"""Antibody numbering-scheme conversion (chothia / kabat / imgt).

The reference accepts ``numbering_scheme`` but silently applies Chothia
ranges regardless (/root/reference/protstruc/protstruc.py:1084-1087,
pdb.py:183-190).  Round 3 closed that trap defensively (wrong-scheme
warning); this module completes it functionally: rule-based, table-driven
conversion of author residue numbers between the three schemes, so a
Chothia-numbered file (the SAbDab convention) can be ingested with
``numbering_scheme="imgt"`` and get correct IMGT CDR masks.

Design
------
A variable domain is segmented into eight structural stretches delimited
by landmarks that every scheme agrees on (the two domain cysteines, the
FR2 tryptophan, the FR4 W/F-G-x-G motif, and the CDR boundaries).  Each
segment carries its author-number span in Kabat/Chothia coordinates
(identical at integer level — the two schemes differ only in which
position carries insertion *letters*: H1 31 vs 35, L1 30 vs 27) and in
IMGT coordinates, plus a fill rule:

* ``start`` — number sequentially from the segment start (anchors the
  left landmark, e.g. FR2's conserved Trp: Kabat H36 <-> IMGT 41).
* ``end`` — number backward from the segment end (anchors the right
  landmark, e.g. the second Cys: Kabat H92 <-> IMGT 104).
* ``fr1`` — first (up to) 9 residues from the start, remainder
  end-anchored: reproduces IMGT's canonical FR1 gap placement (position
  10) for template-length frameworks while keeping the Cys anchored.
* ``loop`` — CDR fill: front half ascending from the start, back half
  descending from the end, gaps (or integer-duplicate "insertions") in
  the middle — the IMGT CDR convention.
* ``cdr1`` — the CDR1 stretch whose *last two* residues are the IMGT
  FR2 shoulder (IMGT 39-40, e.g. Kabat H34-35): they take the top two
  target positions, the remainder loop-fills.

Segment membership is decided by the residue's *source* number; order
within a segment is file order, so insertion-coded residues (stored as
duplicated integers by the parser) convert correctly.  Residues outside
every segment (constant domains, antigens) keep their numbers.

Contract: the input must be correctly numbered in the source scheme.
Loop-length variation is handled exactly; framework indels follow the
template fills (CDR masks stay exact; framework numbers may then differ
from an HMM-based renumberer like ANARCI by a gap position).  Conversion
targets the scheme's integer numbering; insertion letters are not
emitted (the parser tracks integers, which is what every mask consumes).

Verification without a network oracle: conserved-anchor assertions after
conversion (Cys at IMGT 23/104, Trp at IMGT 41/118 on real antibodies)
and cross-scheme mask-set relations (IMGT CDR-H3 = Chothia H3 + the two
preceding FR3 residues, Kabat H2 superset of IMGT CDR-H2, ...) — see
tests/test_numbering.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = ["convert_chain_numbering", "detect_numbering_scheme",
           "SCHEME_ANCHOR_CYS"]


# (name, kabat/chothia integer span, imgt integer span, fill rule)
_HEAVY_SEGMENTS: List[Tuple[str, Tuple[int, int], Tuple[int, int], str]] = [
    ("fr1a", (1, 22),    (1, 23),    "fr1"),    # ends at Cys 22 <-> 23
    ("fr1b", (23, 25),   (24, 26),   "start"),
    ("cdr1", (26, 35),   (27, 40),   "cdr1"),   # last 2 -> IMGT 39-40
    ("fr2",  (36, 50),   (41, 55),   "start"),  # Trp 36 <-> 41
    ("cdr2", (51, 58),   (56, 65),   "loop"),
    ("fr3",  (59, 92),   (66, 104),  "end"),    # ends at Cys 92 <-> 104
    ("cdr3", (93, 102),  (105, 117), "loop"),   # IMGT CDR3 includes K93-94
    ("fr4",  (103, 113), (118, 128), "start"),  # Trp 103 <-> 118
]

_LIGHT_SEGMENTS: List[Tuple[str, Tuple[int, int], Tuple[int, int], str]] = [
    ("fr1a", (1, 23),   (1, 23),    "fr1"),     # ends at Cys 23 <-> 23
    ("fr1b", (24, 26),  (24, 26),   "start"),   # Kabat L1's first 3 = IMGT FR1
    ("cdr1", (27, 34),  (27, 40),   "cdr1"),    # last 2 -> IMGT 39-40
    ("fr2",  (35, 49),  (41, 55),   "start"),   # Trp 35 <-> 41
    ("cdr2", (50, 52),  (56, 65),   "loop"),    # IMGT CDR-L2 is 3 residues
    ("fr3",  (53, 88),  (66, 104),  "end"),     # ends at Cys 88 <-> 104
    ("cdr3", (89, 97),  (105, 117), "loop"),
    ("fr4",  (98, 109), (118, 128), "start"),   # Phe/Trp 98 <-> 118
]

_SEGMENTS = {"heavy": _HEAVY_SEGMENTS, "light": _LIGHT_SEGMENTS}

#: conserved domain-cysteine positions per scheme (chain type -> positions);
#: chothia and kabat share integer positions.
SCHEME_ANCHOR_CYS: Dict[str, Dict[str, Tuple[int, int]]] = {
    "chothia": {"heavy": (22, 92), "light": (23, 88)},
    "kabat": {"heavy": (22, 92), "light": (23, 88)},
    "imgt": {"heavy": (23, 104), "light": (23, 104)},
}


def _span(segment, scheme: str) -> Tuple[int, int]:
    _, kc, imgt, _ = segment
    return imgt if scheme == "imgt" else kc


def _fill(n: int, lo: int, hi: int, rule: str) -> List[int]:
    """Assign ``n`` residues (in order) integer numbers within [lo, hi]."""
    m = hi - lo + 1
    if n == 0:
        return []
    if rule == "start":
        return [lo + min(i, m - 1) for i in range(n)]
    if rule == "end":
        return [hi - min(n - 1 - i, m - 1) for i in range(n)]
    if rule == "fr1":
        front = min(n, 9, m)
        out = [lo + i for i in range(front)]
        out += _fill(n - front, lo + front, hi, "end")
        return out
    if rule == "loop":
        if n >= m:
            front, back = (m + 1) // 2, m // 2
            mid = [lo + front - 1] * (n - m)  # integer-duplicate insertions
            return ([lo + i for i in range(front)] + mid
                    + [hi - back + 1 + i for i in range(back)])
        front, back = (n + 1) // 2, n // 2
        return ([lo + i for i in range(front)]
                + [hi - back + 1 + i for i in range(back)])
    if rule == "cdr1":
        if n <= 2:
            return [hi - 1 + i for i in range(n)][-n:] if n else []
        return _fill(n - 2, lo, hi - 2, "loop") + [hi - 1, hi]
    raise ValueError(f"unknown fill rule {rule!r}")


def convert_chain_numbering(
    numbers: Sequence[int],
    chain_type: str,
    from_scheme: str,
    to_scheme: str,
) -> np.ndarray:
    """Convert one chain's author residue numbers between schemes.

    ``numbers``: integers in file order (insertion-coded residues appear
    as duplicated integers).  ``chain_type``: "heavy" | "light".
    Residues outside the variable domain pass through unchanged.
    """
    numbers = np.asarray(numbers, dtype=np.int64)
    if from_scheme == to_scheme:
        return numbers.copy()
    if chain_type not in _SEGMENTS:
        raise ValueError(f"chain_type must be 'heavy' or 'light', "
                         f"got {chain_type!r}")
    for s in (from_scheme, to_scheme):
        if s not in SCHEME_ANCHOR_CYS:
            raise ValueError(f"unknown scheme {s!r}")

    segments = _SEGMENTS[chain_type]
    out = numbers.copy()
    for seg in segments:
        name, _, _, rule = seg
        lo_f, hi_f = _span(seg, from_scheme)
        lo_t, hi_t = _span(seg, to_scheme)
        idx = np.nonzero((numbers >= lo_f) & (numbers <= hi_f))[0]
        if idx.size == 0:
            continue
        out[idx] = _fill(idx.size, lo_t, hi_t, rule)
    # constant-domain residues past the variable domain keep their order
    # but shift by the domain-length difference, so e.g. Chothia CH1
    # residues 114+ do not collide with IMGT's 114-128 Fv positions
    src_max = _span(segments[-1], from_scheme)[1]
    tgt_max = _span(segments[-1], to_scheme)[1]
    tail = numbers > src_max
    out[tail] = numbers[tail] - src_max + tgt_max
    return out


def detect_numbering_scheme(
    numbers: Sequence[int],
    oneletter: Sequence[str],
    chain_type: str,
) -> Tuple[str, int]:
    """Best-guess scheme for one chain from its conserved-Cys anchors.

    Returns ``(scheme, hits)`` where hits is the number of matched anchor
    cysteines (0-2) for the winning scheme.  Chothia and Kabat share
    integer anchor positions, so "chothia" stands for both (their integer
    numbering is identical; only CDR *definitions* differ).
    """
    numbers = np.asarray(numbers, dtype=np.int64)
    letters = np.asarray(list(oneletter))
    scores = {}
    for scheme in ("chothia", "imgt"):
        anchors = SCHEME_ANCHOR_CYS[scheme][chain_type]
        hits = sum(
            bool(np.any((numbers == pos) & (letters == "C")))
            for pos in anchors
        )
        scores[scheme] = hits
    best = max(scores, key=lambda s: scores[s])
    # deterministic tie-break: prefer chothia (the SAbDab default) when
    # the anchors cannot separate the schemes
    if scores["chothia"] >= scores["imgt"]:
        best = "chothia"
    return best, scores[best]
