"""Literature-pinned DockQ / TM-score values (VERDICT r3 item 5).

The r2/r3 oracle tests check agreement with independent in-test numpy
implementations — which cannot catch a shared misreading of the metric
definition.  These tests pin the scores against the PUBLISHED formulas
with *hand-derived expected values*: each input is a geometric
construction for which the optimal superposition is provably the
identity (both the displaced and undisplaced subsets are centered on the
common centroid, so the Kabsch cross-covariance has no asymmetric rank-1
term and the optimal rotation is I; equal counts make the optimal
translation 0).  That makes fnat / iRMS / LRMS / per-residue deviations
exact closed-form numbers, and the expected score a literal computed
from the published constants only:

* DockQ  = (fnat + 1/(1+(iRMS/1.5)^2) + 1/(1+(LRMS/8.5)^2)) / 3,
  contacts at 5 A heavy-atom, interface at 10 A
  — Basu & Wallner 2016, PLoS ONE 11(8):e0161879, eqs. 2-3.
* TM     = (1/L) sum_i 1/(1+(d_i/d0)^2), d0 = 1.24 (L-15)^(1/3) - 1.8
  — Zhang & Skolnick 2004, Proteins 57:702-710, eq. 4.

(The DockQ paper's example model/native PDB pair and recorded TM-align
outputs need network access this environment does not have; the
closed-form constructions below are the egress-free equivalent — they
exercise the full code path including superposition against values that
do not come from any reimplementation.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from protstruc_tpu.ops.metrics import dockq, fnat, interface_rmsd, tm_score


def _complex_with_ligand_shift(v=1.0):
    """Receptor = 8 cube corners, ligand = the same cube rotated 45 deg
    about z: both residue clouds are centered on the origin, every
    residue carries 4 backbone atoms in +/- symmetric pairs around its
    corner (residue centroid = corner, cloud centroid = 0).  The model
    displaces every ligand atom by v along +z.

    Because the displaced (ligand) and undisplaced (receptor) backbone
    subsets are both centered on the common centroid and have equal atom
    counts, the optimal interface superposition is R=I with translation
    -v/2 applied in the middle: every interface atom deviates by exactly
    |v|/2 -> iRMS = v/2.  Superposing on the receptor alone is exact
    (R=I, t=0), so LRMS = v.  Contacts sit at ~2.3-4.4 A with >0.5 A
    margin, so fnat = 1 for v <= 1.
    """
    r = 3.0
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], float) * r
    c45, s45 = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot_z = np.array([[c45, -s45, 0.0], [s45, c45, 0.0], [0.0, 0.0, 1.0]])
    rec_corners = corners
    lig_corners = corners @ rot_z.T

    # 4 backbone atoms per residue in +/- pairs (N/CA/C/O slots 0-3)
    offs = np.array([[0.5, 0, 0], [-0.5, 0, 0], [0, 0.5, 0], [0, -0.5, 0]])
    L = 16
    xyz = np.full((1, L, 15, 3), np.nan, np.float32)
    atom_mask = np.zeros((1, L, 15), bool)
    for i, c in enumerate(rec_corners):
        xyz[0, i, :4] = c + offs
    for i, c in enumerate(lig_corners):
        xyz[0, 8 + i, :4] = c + offs
    atom_mask[0, :, :4] = True
    rec_mask = np.zeros((1, L), bool)
    lig_mask = np.zeros((1, L), bool)
    rec_mask[0, :8] = True
    lig_mask[0, 8:] = True

    model = xyz.copy()
    model[0, 8:, :4, 2] += v
    return (jnp.asarray(model), jnp.asarray(xyz), jnp.asarray(atom_mask),
            jnp.asarray(rec_mask), jnp.asarray(lig_mask))


def test_dockq_closed_form_value():
    """v = 1 A ligand shift => fnat = 1, iRMS = 0.5, LRMS = 1.0 exactly;
    DockQ = (1 + 1/(1+(0.5/1.5)^2) + 1/(1+(1.0/8.5)^2)) / 3
          = (1 + 0.9 + 0.98634...) / 3 = 0.96211... (hand-derived from
    the published constants 1.5 / 8.5 only)."""
    model, native, am, rm, lm = _complex_with_ligand_shift(v=1.0)

    f = float(fnat(model, native, am, rm, lm)[0])
    assert f == 1.0

    irms = float(interface_rmsd(model, native, am, rm, lm)[0])
    np.testing.assert_allclose(irms, 0.5, atol=1e-5)

    got = float(dockq(model, native, am, rm, lm)[0])
    expected = (1.0 + 1.0 / (1.0 + (0.5 / 1.5) ** 2)
                + 1.0 / (1.0 + (1.0 / 8.5) ** 2)) / 3.0
    np.testing.assert_allclose(expected, 0.9621160, atol=1e-6)  # literal
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_dockq_quality_band_thresholds():
    """The published CAPRI-correspondence bands (incorrect < 0.23 <=
    acceptable < 0.49 <= medium < 0.80 <= high): a near-native model must
    score high quality, a blown-up one incorrect."""
    model, native, am, rm, lm = _complex_with_ligand_shift(v=0.5)
    assert float(dockq(model, native, am, rm, lm)[0]) > 0.80

    far = np.asarray(native).copy()
    far[0, 8:, :4, 2] += 60.0  # ligand nowhere near: all contacts lost
    assert float(dockq(jnp.asarray(far), native, am, rm, lm)[0]) < 0.23


def _tm_inputs(v, n_half=63):
    """Two interleaved centered clouds of n_half points each; the model
    displaces cloud A by +v z and cloud B by -v z.  Both subsets are
    centered on the common centroid with equal counts, so the optimal
    superposition is the identity and every residue deviates by exactly
    |v| — even with align=True."""
    rng = np.random.default_rng(0)
    a_cloud = rng.normal(size=(n_half, 3)) * 8.0
    a_cloud -= a_cloud.mean(0)
    b_cloud = rng.normal(size=(n_half, 3)) * 8.0
    b_cloud -= b_cloud.mean(0)
    native = np.concatenate([a_cloud, b_cloud]).astype(np.float32)
    model = native.copy()
    model[:n_half, 2] += v
    model[n_half:, 2] -= v
    return jnp.asarray(model[None]), jnp.asarray(native[None])


def test_tm_score_closed_form_value():
    """L = 126, every d_i = 2.0 A exactly =>
    d0 = 1.24 (126-15)^(1/3) - 1.8 and TM = 1/(1+(2/d0)^2), all from the
    published Zhang-Skolnick constants (1.24, 15, 1.8)."""
    model, native = _tm_inputs(v=2.0)
    d0 = 1.24 * 111.0 ** (1.0 / 3.0) - 1.8
    expected = 1.0 / (1.0 + (2.0 / d0) ** 2)
    np.testing.assert_allclose(expected, 0.8122054, atol=1e-6)  # literal

    got = float(tm_score(model, native, align=True)[0])
    np.testing.assert_allclose(got, expected, atol=1e-5)
    got_noalign = float(tm_score(model, native, align=False)[0])
    np.testing.assert_allclose(got_noalign, expected, atol=1e-5)


def test_tm_score_d0_floor():
    """Zhang & Skolnick clamp d0 for short chains; for L <= 21 the
    formula goes non-positive and the implementation pins d0 = 0.5."""
    model, native = _tm_inputs(v=1.0, n_half=8)  # L = 16
    expected = 1.0 / (1.0 + (1.0 / 0.5) ** 2)  # = 0.2
    got = float(tm_score(model, native, align=False)[0])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_tm_score_l_target_normalization():
    """TM-score normalizes by the TARGET length: padding the model/native
    pair while passing l_target must reproduce the unpadded score (the
    TM-align convention of normalizing by the reference chain)."""
    model, native = _tm_inputs(v=2.0)
    base = float(tm_score(model, native, align=False)[0])
    got = float(tm_score(model, native, align=False,
                         l_target=jnp.asarray([126.0]))[0])
    np.testing.assert_allclose(got, base, atol=1e-6)


def test_capri_band_boundaries():
    """Boundary DockQ values land in the UPPER band (Basu & Wallner 2016):
    incorrect < 0.23 <= acceptable < 0.49 <= medium < 0.80 <= high."""
    from protstruc_tpu.ops.metrics import capri_band

    assert capri_band(0.80) == "high"
    assert capri_band(0.799) == "medium"
    assert capri_band(0.49) == "medium"
    assert capri_band(0.489) == "acceptable"
    assert capri_band(0.23) == "acceptable"
    assert capri_band(0.229) == "incorrect"
