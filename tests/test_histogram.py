"""Distance binning / contact map / histogram tests."""

import jax.numpy as jnp
import numpy as np

from protstruc_tpu import StructureBatch
from protstruc_tpu.ops.histogram import contact_map, distance_histogram, distogram_bins

from tests.conftest import pdb_path


def test_distogram_bins():
    d = jnp.array([[0.0, 5.0, 19.99, 20.0, 100.0, jnp.nan]])
    bins = np.asarray(distogram_bins(d, n_bins=20, max_dist=20.0))
    assert bins.tolist() == [[0, 5, 19, 19, 19, 19]]


def test_contact_map_real_structure():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    d, m = sb.pairwise_atom_distance("CB", "CB")
    c = np.asarray(contact_map(d, m, cutoff=8.0))
    assert c.shape == (1, 130, 130)
    assert (c == c.transpose(0, 2, 1)).all()      # symmetric
    # self-contacts exactly where CB exists (glycines have no CB)
    np.testing.assert_array_equal(
        np.diagonal(c[0]), np.diagonal(np.asarray(m)[0])
    )
    # folded protein: a few percent of pairs are contacts
    frac = c.sum() / np.asarray(m).sum()
    assert 0.02 < frac < 0.5


def test_distance_histogram_counts():
    d = jnp.array([[[0.5, 1.5], [2.5, jnp.nan]]])  # (1, 2, 2)
    h = np.asarray(distance_histogram(d, n_bins=4, max_dist=4.0))
    assert h.shape == (1, 4)
    assert h.tolist() == [[1, 1, 1, 0]]  # NaN dropped


def test_distance_histogram_total():
    sb = StructureBatch.from_pdb(pdb_path("1REX.pdb"))
    d, m = sb.pairwise_atom_distance("CA", "CA")
    h = np.asarray(distance_histogram(d, m, n_bins=32, max_dist=64.0))
    # every valid pair within range lands in exactly one bin
    valid = np.asarray(m) & (np.asarray(d) < 64.0)
    assert h.sum() == valid.sum()
