"""Numerical parity vs the reference torch implementation.

The reference's geometry module (/root/reference/protstruc/geometry.py) is
pure torch/numpy and importable without biotite, so we use it as a golden
oracle: on identical random inputs, our JAX kernels must agree to <= 1e-5
(BASELINE.md parity requirement).

Skipped automatically when the reference checkout is not present.
"""

import numpy as np
import pytest

import protstruc_tpu.geometry as geom
from tests.ref_oracle import load_reference


@pytest.fixture(scope="module")
def ref_geom():
    ref = load_reference()
    if ref is None:
        pytest.skip("reference implementation not available")
    return ref.geometry


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_angle_parity(ref_geom):
    a, b, c = _rand(64, 3, seed=1), _rand(64, 3, seed=2), _rand(64, 3, seed=3)
    ours = np.asarray(geom.angle(a, b, c))
    theirs = np.asarray(ref_geom.angle(a, b, c))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_dihedral_parity(ref_geom):
    a, b, c, d = (_rand(128, 3, seed=s) for s in range(4, 8))
    ours = np.asarray(geom.dihedral(a, b, c, d))
    theirs = np.asarray(ref_geom.dihedral(a, b, c, d))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_dihedral_parity_batched(ref_geom):
    a, b, c, d = (_rand(4, 32, 3, seed=s) for s in range(8, 12))
    ours = np.asarray(geom.dihedral(a, b, c, d))
    theirs = np.asarray(ref_geom.dihedral(a, b, c, d))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gram_schmidt_parity(ref_geom):
    import torch

    a, b, c = _rand(16, 30, 3, seed=20), _rand(16, 30, 3, seed=21), _rand(16, 30, 3, seed=22)
    ours = np.asarray(geom.gram_schmidt(a, b, c))
    theirs = (
        ref_geom.gram_schmidt(torch.tensor(a), torch.tensor(b), torch.tensor(c))
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_place_fourth_atom_parity(ref_geom):
    import torch

    a, b, c = _rand(32, 3, seed=30), _rand(32, 3, seed=31), _rand(32, 3, seed=32)
    length = np.abs(_rand(32, 1, seed=33)) + 1.0
    planar = np.abs(_rand(32, 1, seed=34)) % np.pi
    dih = _rand(32, 1, seed=35)

    ours = np.asarray(geom.place_fourth_atom(a, b, c, length, planar, dih))
    theirs = ref_geom.place_fourth_atom(
        torch.tensor(a), torch.tensor(b), torch.tensor(c),
        torch.tensor(length), torch.tensor(planar), torch.tensor(dih),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ideal_local_frame_parity(ref_geom):
    # The reference's ideal_local_frame itself crashes on modern torch
    # (torch.cross over numpy arrays inside place_fourth_atom,
    # geometry.py:158), so replicate its formula with torch inputs and
    # compare against our jnp version.
    import torch

    from protstruc_tpu.constants import ideal

    n = torch.zeros(3)
    ca = torch.tensor([0.0, 0.0, ideal.NA])
    cb = torch.tensor(
        [
            0.0,
            float(ideal.AB * np.sin(ideal.NAB)),
            float(ideal.NA - ideal.AB * np.cos(ideal.NAB)),
        ]
    )
    c = ref_geom.place_fourth_atom(
        cb.unsqueeze(0), ca.unsqueeze(0), n.unsqueeze(0),
        torch.tensor([[ideal.NC]]), torch.tensor([[ideal.ANC]]),
        torch.tensor([[ideal.BANC]]),
    ).squeeze(0)
    theirs = torch.stack([n, ca, c, cb]).numpy()
    ours = np.asarray(geom.ideal_local_frame())
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ideal_backbone_coordinates_parity(ref_geom):
    ours = np.asarray(geom.ideal_backbone_coordinates((4, 7), include_cb=True))
    theirs = ref_geom.ideal_backbone_coordinates((4, 7), include_cb=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    ours3 = np.asarray(geom.ideal_backbone_coordinates((4, 7)))
    theirs3 = ref_geom.ideal_backbone_coordinates((4, 7)).numpy()
    np.testing.assert_allclose(ours3, theirs3, atol=1e-5)


def test_kabsch_parity(ref_geom):
    import torch

    a, b = _rand(100, 3, seed=40), _rand(100, 3, seed=41)
    r_ours, t_ours = geom.kabsch(a, b)
    r_ref, t_ref = ref_geom.kabsch(torch.tensor(a), torch.tensor(b))
    np.testing.assert_allclose(np.asarray(r_ours), r_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_ours), t_ref.numpy(), atol=1e-4)
