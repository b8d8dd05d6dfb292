"""Antibody numbering-scheme conversion (protstruc_tpu/numbering.py).

The reference silently applies Chothia ranges for every requested scheme
(protstruc.py:1084-1087); the rebuild converts.  Verified without a
network oracle via (a) template round-trips that must be integer-exact,
(b) conserved-anchor positions after conversion on real SAbDab
Chothia-numbered files (6dc4, 15c8), and (c) published cross-scheme
mask-set relations (IMGT CDR-H3 = Chothia H3 plus the two preceding FR3
residues; Kabat H2 strictly contains IMGT CDR-H2; ...).
"""

import numpy as np
import pytest

from protstruc_tpu.numbering import (
    convert_chain_numbering, detect_numbering_scheme)

from tests.conftest import pdb_path


# ---------------------------------------------------------------------------
# pure-function: template chains
# ---------------------------------------------------------------------------


def test_template_heavy_round_trip_exact():
    """A template-length heavy chain (one residue per Kabat position
    1..113) converts to IMGT and back integer-exactly."""
    nums = np.arange(1, 114)
    imgt = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    back = convert_chain_numbering(imgt, "heavy", "imgt", "chothia")
    np.testing.assert_array_equal(back, nums)

    # conserved landmarks (Dondelinger et al. 2018 / IMGT unique numbering)
    bynum = dict(zip(nums.tolist(), imgt.tolist()))
    assert bynum[22] == 23     # first domain Cys
    assert bynum[36] == 41     # FR2 Trp
    assert bynum[92] == 104    # second domain Cys
    assert bynum[103] == 118   # FR4 Trp (W-G-x-G motif)
    assert bynum[113] == 128   # Fv end
    # IMGT numbers are monotone non-decreasing along the chain
    assert (np.diff(imgt) >= 0).all()


def test_template_light_round_trip_exact():
    nums = np.arange(1, 110)
    imgt = convert_chain_numbering(nums, "light", "chothia", "imgt")
    back = convert_chain_numbering(imgt, "light", "imgt", "chothia")
    np.testing.assert_array_equal(back, nums)

    bynum = dict(zip(nums.tolist(), imgt.tolist()))
    assert bynum[23] == 23     # first domain Cys
    assert bynum[35] == 41     # FR2 Trp
    assert bynum[88] == 104    # second domain Cys
    assert bynum[98] == 118    # FR4 Phe/Trp
    assert (np.diff(imgt) >= 0).all()


def test_imgt_cdr_h3_extends_chothia_h3_by_two():
    """IMGT CDR3 (105-117) covers Kabat/Chothia 93-102: the Chothia H3
    (95-102) plus the two residues before it."""
    nums = np.arange(1, 114)
    imgt = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    in_imgt_h3 = (imgt >= 105) & (imgt <= 117)
    in_chothia_h3 = (nums >= 95) & (nums <= 102)
    assert (in_imgt_h3 & in_chothia_h3).sum() == in_chothia_h3.sum()
    assert in_imgt_h3.sum() == in_chothia_h3.sum() + 2
    np.testing.assert_array_equal(np.nonzero(in_imgt_h3)[0][:2],
                                  np.nonzero(nums == 93)[0].tolist()
                                  + np.nonzero(nums == 94)[0].tolist())


def test_long_h3_insertions_round_trip_masks():
    """A 17-residue H3 (Kabat insertion codes parse as duplicated 100s)
    keeps every loop residue inside the CDR3 range both ways."""
    nums = np.concatenate([
        np.arange(1, 100),                      # ...through 99
        np.full(8, 100),                        # 100,100A-100G as ints
        np.arange(101, 114),
    ])
    imgt = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    back = convert_chain_numbering(imgt, "heavy", "imgt", "chothia")

    h3_src = (nums >= 93) & (nums <= 102)
    assert ((imgt[h3_src] >= 105) & (imgt[h3_src] <= 117)).all()
    h3_back = (back >= 93) & (back <= 102)
    np.testing.assert_array_equal(h3_back, h3_src)
    # frameworks stay put
    np.testing.assert_array_equal(back[~h3_src], nums[~h3_src])


def test_short_loops_stay_in_range():
    """A short L1 (deleted positions) still lands inside IMGT 27-38."""
    # light chain with a 8-residue Kabat L1 (positions 27-29 absent)
    nums = np.concatenate([np.arange(1, 27), np.arange(30, 110)])
    imgt = convert_chain_numbering(nums, "light", "chothia", "imgt")
    l1_src = (nums >= 24) & (nums <= 34)
    # the IMGT CDR1 portion (all but the first 3 / last 2 of Kabat L1)
    mid = l1_src & (nums >= 27) & (nums <= 32)
    assert ((imgt[mid] >= 27) & (imgt[mid] <= 38)).all()
    back = convert_chain_numbering(imgt, "light", "imgt", "chothia")
    l1_back = (back >= 24) & (back <= 34)
    np.testing.assert_array_equal(l1_back, l1_src)


def test_constant_domain_shifts_past_fv():
    """Chothia CH1 numbers (114+) must not collide with IMGT 114-128."""
    nums = np.arange(1, 220)
    imgt = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    ch1 = nums > 113
    assert (imgt[ch1] > 128).all()
    assert (np.diff(imgt) >= 0).all()
    back = convert_chain_numbering(imgt, "heavy", "imgt", "chothia")
    np.testing.assert_array_equal(back, nums)


def test_identity_and_validation():
    nums = np.arange(1, 114)
    np.testing.assert_array_equal(
        convert_chain_numbering(nums, "heavy", "imgt", "imgt"), nums)
    with pytest.raises(ValueError, match="chain_type"):
        convert_chain_numbering(nums, "antigen", "chothia", "imgt")
    with pytest.raises(ValueError, match="unknown scheme"):
        convert_chain_numbering(nums, "heavy", "chothia", "martin")


# ---------------------------------------------------------------------------
# detection + real structures
# ---------------------------------------------------------------------------


def _parse_chain(path, chain):
    from protstruc_tpu.pdbio.parser import parse_pdb

    p = parse_pdb(path, chains=[chain])
    sel = p.chain_id_per_res == chain
    return p.residue_number[sel].astype(np.int64), p.oneletter[sel]


@pytest.mark.parametrize("fname,hid,lid", [
    ("6dc4.pdb", "H", "L"), ("15c8_HL.pdb", "H", "L")])
def test_detect_chothia_on_sabdab_files(fname, hid, lid):
    for chain, ctype in ((hid, "heavy"), (lid, "light")):
        nums, letters = _parse_chain(pdb_path(fname), chain)
        scheme, hits = detect_numbering_scheme(nums, letters, ctype)
        assert scheme == "chothia" and hits == 2, (fname, chain)


def test_detect_imgt_numbering():
    """Converted numbers must be detected as IMGT."""
    nums, letters = _parse_chain(pdb_path("6dc4.pdb"), "H")
    imgt = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    scheme, hits = detect_numbering_scheme(imgt, letters, "heavy")
    assert scheme == "imgt" and hits == 2


@pytest.mark.parametrize("fname", ["6dc4.pdb", "15c8_HL.pdb"])
def test_conserved_anchors_after_conversion(fname):
    """After chothia->imgt conversion of real chains, the IMGT anchor
    positions carry their conserved residues: Cys23, Trp41, Cys104 and
    the FR4 Trp118 (heavy) / Phe118 (light)."""
    for chain, ctype in (("H", "heavy"), ("L", "light")):
        nums, letters = _parse_chain(pdb_path(fname), chain)
        imgt = convert_chain_numbering(nums, ctype, "chothia", "imgt")
        bynum = dict(zip(imgt.tolist(), letters.tolist()))
        assert bynum.get(23) == "C", (fname, chain, 23)
        assert bynum.get(104) == "C", (fname, chain, 104)
        assert bynum.get(41) == "W", (fname, chain, 41)
        assert bynum.get(118) in ("W", "F"), (fname, chain, 118)


# ---------------------------------------------------------------------------
# batch-level: from_pdb with scheme conversion
# ---------------------------------------------------------------------------


def _masks(batch):
    return {k: np.asarray(batch.get_cdr_mask(k))[0]
            for k in ["H1", "H2", "H3", "L1", "L2", "L3"]}


@pytest.mark.parametrize("fname", ["6dc4.pdb", "15c8_HL.pdb"])
def test_from_pdb_imgt_masks_on_chothia_file(fname):
    """The VERDICT r3 item-4 acceptance: numbering_scheme='imgt' on a
    Chothia-numbered SAbDab file produces correct IMGT CDR masks."""
    import warnings

    from protstruc_tpu.antibody import AntibodyStructureBatch

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no wrong-scheme warning may fire
        ab_c = AntibodyStructureBatch.from_pdb(
            pdb_path(fname), heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="chothia")
        ab_i = AntibodyStructureBatch.from_pdb(
            pdb_path(fname), heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="imgt")
        ab_k = AntibodyStructureBatch.from_pdb(
            pdb_path(fname), heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="kabat")

    mc, mi, mk = _masks(ab_c), _masks(ab_i), _masks(ab_k)
    for name in mi:
        assert mi[name].any(), f"empty IMGT {name}"

    # published cross-scheme relations, asserted positionally:
    # IMGT CDR-H3 = Chothia/Kabat H3 plus exactly the 2 preceding residues
    assert (mi["H3"] & mc["H3"]).sum() == mc["H3"].sum()
    assert mi["H3"].sum() == mc["H3"].sum() + 2
    # Chothia H1 (structural loop) is inside IMGT CDR-H1
    assert (mi["H1"] & mc["H1"]).sum() == mc["H1"].sum()
    # Kabat H2 (50-65) strictly contains IMGT CDR-H2
    assert (mk["H2"] & mi["H2"]).sum() == mi["H2"].sum()
    assert mk["H2"].sum() > mi["H2"].sum()
    # Kabat/Chothia L1 (24-34) contains IMGT CDR-L1
    assert (mk["L1"] & mi["L1"]).sum() == mi["L1"].sum()
    # IMGT CDR-L2 is the 3-residue loop at the head of Kabat L2
    assert mi["L2"].sum() == 3
    assert (mk["L2"] & mi["L2"]).sum() == mi["L2"].sum()
    # L3: same loop, IMGT range just renumbers it
    assert mi["L3"].sum() == mc["L3"].sum()
    np.testing.assert_array_equal(mi["L3"], mc["L3"])


def test_from_pdb_explicit_source_scheme_matches_auto():
    from protstruc_tpu.antibody import AntibodyStructureBatch

    auto = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
        numbering_scheme="imgt")
    explicit = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
        numbering_scheme="imgt", source_scheme="chothia")
    for k in ["H1", "H2", "H3", "L1", "L2", "L3", "fv"]:
        np.testing.assert_array_equal(
            np.asarray(auto.residue_masks[k]),
            np.asarray(explicit.residue_masks[k]), err_msg=k)


def test_from_pdb_source_none_keeps_round2_behavior():
    """source_scheme=None asserts the file is already in the requested
    scheme: ranges applied as-is, wrong-scheme plausibility warning."""
    from protstruc_tpu.antibody import AntibodyStructureBatch

    with pytest.warns(UserWarning, match="numbered in a different scheme"):
        AntibodyStructureBatch.from_pdb(
            pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="imgt", source_scheme=None)


def _masked_seq(ab, mask):
    seq = "".join(ab.get_seq()[0][c] for c in ab.chain_ids[0])
    m = np.asarray(mask)[0][: len(seq)]
    return "".join(ch for ch, keep in zip(seq, m) if keep)


def test_keep_fv_only_with_conversion():
    """Fv trimming happens in converted coordinates: the IMGT-trimmed Fv
    covers the Chothia-trimmed Fv (IMGT's variable domain extends 1-2
    residues further at the light FR4 tail — Chothia's fv_light table
    stops at 106 while the VL domain runs to ~107)."""
    from protstruc_tpu.antibody import AntibodyStructureBatch

    ab_c = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
        numbering_scheme="chothia", keep_fv_only=True)
    ab_i = AntibodyStructureBatch.from_pdb(
        pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
        numbering_scheme="imgt", keep_fv_only=True)
    n_c = int(ab_c.get_fv_mask().sum())
    n_i = int(ab_i.get_fv_mask().sum())
    assert n_c <= n_i <= n_c + 2
    # the chothia Fv sequences are prefixes of the imgt Fv sequences
    for chain in "HL":
        assert ab_i.get_seq()[0][chain].startswith(ab_c.get_seq()[0][chain])
    # the same structural loop survives either trim
    assert (_masked_seq(ab_i, ab_i.get_cdr_mask("L3"))
            == _masked_seq(ab_c, ab_c.get_cdr_mask("L3")))
    assert (_masked_seq(ab_i, ab_i.get_cdr_mask("H3"))[2:]
            == _masked_seq(ab_c, ab_c.get_cdr_mask("H3")))


# ---------------------------------------------------------------------------
# file-level renumbering (renumber_pdb + CLI)
# ---------------------------------------------------------------------------


def test_renumber_pdb_round_trip_6dc4(tmp_path):
    """File-level chothia->imgt->chothia on 6dc4 (insertions at the
    Chothia anchors 52/82/100 heavy, 30 light) is integer-exact; IMGT
    anchors hold in the intermediate file."""
    from protstruc_tpu.numbering import renumber_pdb
    from protstruc_tpu.pdbio.parser import parse_pdb

    imgt = str(tmp_path / "imgt.pdb")
    back = str(tmp_path / "back.pdb")
    s = renumber_pdb(pdb_path("6dc4.pdb"), imgt,
                     heavy_chain_id="H", light_chain_id="L", to_scheme="imgt")
    assert s == {"H": {"from": "chothia", "to": "imgt"},
                 "L": {"from": "chothia", "to": "imgt"}}

    p1 = parse_pdb(imgt)
    r1 = p1.atom_mask.any(1)
    h = (p1.chain_id_per_res == "H") & r1
    bynum = dict(zip(p1.residue_number[h].tolist(), p1.oneletter[h].tolist()))
    assert bynum[23] == "C" and bynum[104] == "C" and bynum[41] == "W"

    renumber_pdb(imgt, back, heavy_chain_id="H", light_chain_id="L",
                 to_scheme="chothia")
    p0 = parse_pdb(pdb_path("6dc4.pdb"))
    r0 = p0.atom_mask.any(1)
    p2 = parse_pdb(back)
    r2 = p2.atom_mask.any(1)
    np.testing.assert_array_equal(p2.residue_number[r2],
                                  p0.residue_number[r0])
    np.testing.assert_allclose(p2.atom_xyz[p2.atom_mask],
                               p0.atom_xyz[p0.atom_mask], atol=1e-3)


def test_renumber_pdb_normalizes_kabat_placed_insertions(tmp_path):
    """15c8's L1 insertion letter sits at position 27 (the KABAT anchor);
    chothia and kabat integers are otherwise identical, so the round trip
    returns the same residue SET with the insertion normalized to the
    Chothia anchor (30) — masks must be unchanged, ints differ only
    inside the L1 loop."""
    from protstruc_tpu.antibody import AntibodyStructureBatch
    from protstruc_tpu.numbering import renumber_pdb
    from protstruc_tpu.pdbio.parser import parse_pdb

    imgt = str(tmp_path / "imgt.pdb")
    back = str(tmp_path / "back.pdb")
    renumber_pdb(pdb_path("15c8_HL.pdb"), imgt,
                 heavy_chain_id="H", light_chain_id="L", to_scheme="imgt")
    renumber_pdb(imgt, back, heavy_chain_id="H", light_chain_id="L",
                 to_scheme="chothia")

    p0 = parse_pdb(pdb_path("15c8_HL.pdb"))
    r0 = p0.atom_mask.any(1)
    p2 = parse_pdb(back)
    r2 = p2.atom_mask.any(1)
    a, b = p2.residue_number[r2], p0.residue_number[r0]
    diff = np.nonzero(a != b)[0]
    assert len(diff) <= 4  # only within the L1 loop
    assert ((b[diff] >= 24) & (b[diff] <= 34)).all()

    ab0 = AntibodyStructureBatch.from_pdb(
        pdb_path("15c8_HL.pdb"), heavy_chain_id="H", light_chain_id="L")
    ab2 = AntibodyStructureBatch.from_pdb(
        back, heavy_chain_id="H", light_chain_id="L")
    for k in ["H1", "H2", "H3", "L1", "L2", "L3"]:
        assert (int(np.asarray(ab0.get_cdr_mask(k)).sum())
                == int(np.asarray(ab2.get_cdr_mask(k)).sum())), k


def test_imgt_file_ingests_with_imgt_scheme(tmp_path):
    """A renumbered IMGT file ingested with numbering_scheme='imgt'
    (auto-detection finds imgt -> no conversion) gives the same CDR mask
    sizes as the original Chothia file ingested with scheme='imgt'
    (conversion path)."""
    import warnings

    from protstruc_tpu.antibody import AntibodyStructureBatch
    from protstruc_tpu.numbering import renumber_pdb

    imgt = str(tmp_path / "imgt.pdb")
    renumber_pdb(pdb_path("6dc4.pdb"), imgt,
                 heavy_chain_id="H", light_chain_id="L", to_scheme="imgt")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ab_f = AntibodyStructureBatch.from_pdb(
            imgt, heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="imgt")
        ab_c = AntibodyStructureBatch.from_pdb(
            pdb_path("6dc4.pdb"), heavy_chain_id="H", light_chain_id="L",
            numbering_scheme="imgt")
    # compare over atom-bearing residues: the IMGT file's convention gaps
    # (e.g. CDR middles) re-parse as zero-atom UNK gap rows whose numbers
    # fall inside the CDR ranges — they carry no atoms, so every consumer
    # of the masks sees identical features either way
    rm_f = np.asarray(ab_f.residue_mask)
    rm_c = np.asarray(ab_c.residue_mask)
    for k in ["H1", "H2", "H3", "L1", "L2", "L3"]:
        assert (int((np.asarray(ab_f.get_cdr_mask(k)) & rm_f).sum())
                == int((np.asarray(ab_c.get_cdr_mask(k)) & rm_c).sum())), k


# ---------------------------------------------------------------------------
# gap robustness + detection ambiguity (round-4 review fixes)
# ---------------------------------------------------------------------------


def test_interior_gap_does_not_shift_framework():
    """Disordered interior residues (here Chothia H60-65 missing from FR3)
    must not shift the rest of the framework off its conserved landmarks:
    every present residue converts to the same IMGT number as in the
    complete chain, and the missing stretch leaves a gap at its own
    position instead of sliding the segment."""
    full = np.arange(1, 114)
    gapped = full[(full < 60) | (full > 65)]
    conv_full = convert_chain_numbering(full, "heavy", "chothia", "imgt")
    conv_gap = convert_chain_numbering(gapped, "heavy", "chothia", "imgt")
    lookup = dict(zip(full.tolist(), conv_full.tolist()))
    np.testing.assert_array_equal(
        conv_gap, np.asarray([lookup[n] for n in gapped.tolist()]))
    # the second Cys stays anchored: Chothia 92 -> IMGT 104
    assert lookup[92] == 104
    assert dict(zip(gapped.tolist(), conv_gap.tolist()))[92] == 104


def test_truncated_nterm_keeps_own_numbers():
    """A chain whose first residues are disordered (starts at Chothia 4)
    keeps start-anchored offsets instead of renumbering from 1."""
    nums = np.arange(4, 114)
    conv = convert_chain_numbering(nums, "heavy", "chothia", "imgt")
    assert conv[0] == 4  # fr1 start-anchored by offset
    assert conv[np.nonzero(nums == 22)[0][0]] == 23  # first Cys


def test_ambiguous_detection_leaves_numbering_alone(tmp_path):
    """An IMGT-numbered light chain whose SECOND anchor Cys is absent
    (disordered) ties the anchor scores (shared Cys-23); auto-detection
    must then leave the numbering unconverted (with a warning) rather
    than silently re-gapping an already-correct chain."""
    import warnings

    from protstruc_tpu.numbering import renumber_pdb, scheme_anchor_scores

    imgt = str(tmp_path / "imgt.pdb")
    renumber_pdb(pdb_path("6dc4.pdb"), imgt,
                 heavy_chain_id="H", light_chain_id="L", to_scheme="imgt")
    # drop the light chain's Cys-104 to force the tie
    out_lines = []
    for line in open(imgt):
        if (line.startswith("ATOM") and line[21] == "L"
                and int(line[22:26]) == 104 and line[17:20] == "CYS"):
            continue
        out_lines.append(line)
    tied = str(tmp_path / "tied.pdb")
    open(tied, "w").writelines(out_lines)

    from protstruc_tpu.pdbio.parser import parse_pdb

    p = parse_pdb(tied)
    sel = p.chain_id_per_res == "L"
    real = sel & p.atom_mask.any(axis=1)
    scores = scheme_anchor_scores(p.residue_number[real].astype(np.int64),
                                  p.oneletter[real], "light")
    assert scores["chothia"] == scores["imgt"] == 1  # genuinely ambiguous

    out = str(tmp_path / "out.pdb")
    with pytest.warns(UserWarning, match="cannot separate"):
        summary = renumber_pdb(tied, out, heavy_chain_id="H",
                               light_chain_id="L", to_scheme="imgt")
    # light chain untouched (treated as already-imgt), heavy converted
    assert summary["L"]["from"] == "imgt"
    p2 = parse_pdb(out)
    sel2 = p2.chain_id_per_res == "L"
    real2 = sel2 & p2.atom_mask.any(axis=1)
    np.testing.assert_array_equal(p2.residue_number[real2],
                                  p.residue_number[real])


def test_random_gaps_and_insertions_properties():
    """Seeded fuzz over random interior gaps + insertion duplicates:

    * framework residues (outside every CDR span) round-trip exactly,
    * surviving anchor landmarks map to their cross-scheme positions,
    * converted numbering stays nondecreasing (file order preserved),
    * CDR membership is preserved (source-span residues map into the
      target span).
    """
    from protstruc_tpu.numbering import (
        _SEGMENTS, _span, SCHEME_ANCHOR_CYS)

    rng = np.random.RandomState(7)
    for trial in range(60):
        ctype = ["heavy", "light"][trial % 2]
        segments = _SEGMENTS[ctype]
        top = _span(segments[-1], "chothia")[1]
        nums = list(range(1, top + 1))
        # random interior gaps (up to 12 positions)
        drop = set(rng.choice(np.arange(2, top), size=rng.randint(0, 13),
                              replace=False).tolist())
        nums = [n for n in nums if n not in drop]
        # random insertion duplicates (duplicate an existing number 0-3x)
        for _ in range(rng.randint(0, 4)):
            pos = int(rng.choice(nums))
            nums.insert(nums.index(pos), pos)
        nums = np.asarray(nums, dtype=np.int64)

        imgt = convert_chain_numbering(nums, ctype, "chothia", "imgt")
        back = convert_chain_numbering(imgt, ctype, "imgt", "chothia")

        # monotone in file order
        assert np.all(np.diff(imgt) >= 0), (trial, ctype)
        assert np.all(np.diff(back) >= 0), (trial, ctype)

        cdr_names = {"cdr1", "cdr2", "cdr3"}
        loop_kc = [(s, _span(s, "chothia")) for s in segments
                   if s[0] in cdr_names]
        in_any_loop = np.zeros(nums.shape, bool)
        for s, (lo, hi) in loop_kc:
            sel = (nums >= lo) & (nums <= hi)
            in_any_loop |= sel
            # membership preserved into the imgt span
            lo_t, hi_t = _span(s, "imgt")
            assert np.all((imgt[sel] >= lo_t) & (imgt[sel] <= hi_t)), (
                trial, ctype, s[0])

        # frameworks round-trip exactly for uniquely-numbered residues
        # (loops are length-filled; insertion DUPLICATES adjacent to a
        # dropped position may legitimately spread into the free slot,
        # so only unique source numbers are guaranteed exact)
        _, counts = np.unique(nums, return_counts=True)
        dup_values = set(np.unique(nums)[counts > 1].tolist())
        unique_src = np.asarray([n not in dup_values for n in nums.tolist()])
        fw = ~in_any_loop & unique_src
        np.testing.assert_array_equal(back[fw], nums[fw],
                                      err_msg=f"trial {trial} {ctype}")

        # surviving anchor cysteines land on the imgt anchors
        kc_cys = SCHEME_ANCHOR_CYS["chothia"][ctype]
        imgt_cys = SCHEME_ANCHOR_CYS["imgt"][ctype]
        for kc_pos, imgt_pos in zip(kc_cys, imgt_cys):
            hit = np.nonzero(nums == kc_pos)[0]
            if hit.size == 1:  # skip if dropped or duplicated
                assert imgt[hit[0]] == imgt_pos, (trial, ctype, kc_pos)
