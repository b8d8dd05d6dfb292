"""Sidechain grafting tests."""

import jax.numpy as jnp
import numpy as np

import protstruc_tpu as ps
from protstruc_tpu.ops.chi import chi_angles, chi_tables
from protstruc_tpu.ops.graft import build_sidechains, sidechain_library
from protstruc_tpu.vocab import AA


def _sb():
    return ps.StructureBatch.from_pdb("tests/data/1REX.pdb")


class TestLibrary:
    def test_extracts_all_types_present(self):
        sb = _sb()
        lib, lib_mask = sidechain_library(sb)
        seq = np.asarray(sb.get_seq_idx())
        present = set(np.unique(seq[seq < 20]))
        for aa in present:
            # every residue type present with complete atoms got a template
            if lib_mask[aa].any():
                assert lib_mask[aa][:4].all()
        # GLY template has no CB
        assert not lib_mask[int(AA.GLY), 4]

    def test_local_frame_is_canonical(self):
        sb = _sb()
        lib, lib_mask = sidechain_library(sb)
        # CA sits at the origin of the local frame
        for aa in range(20):
            if lib_mask[aa, 1]:
                np.testing.assert_allclose(lib[aa, 1], 0.0, atol=1e-5)


class TestBuild:
    def test_graft_onto_native_backbone(self):
        sb = _sb()
        lib = sidechain_library(sb)
        xyz, mask = build_sidechains(
            sb.xyz[:, :, :3], sb.get_seq_idx(), lib, sb.residue_mask
        )
        assert xyz.shape == sb.xyz.shape
        # backbone preserved exactly
        np.testing.assert_allclose(
            np.asarray(xyz[:, :, :3])[np.asarray(sb.atom_mask[:, :, :3])],
            np.asarray(sb.xyz[:, :, :3])[np.asarray(sb.atom_mask[:, :, :3])],
            atol=1e-5,
        )
        # grafted structure has sensible CA-CB bonds where CB exists
        m = np.asarray(mask)
        has_cb = m[:, :, 4]
        d = np.linalg.norm(
            np.asarray(xyz[:, :, 4] - xyz[:, :, 1]), axis=-1
        )[has_cb]
        assert (np.abs(d - 1.53) < 0.1).all()

        # all chis defined for the full sidechains (library is complete)
        chi, chi_mask = chi_angles(xyz, sb.get_seq_idx(), mask)
        _, _, defined = chi_tables()
        seq = np.asarray(sb.get_seq_idx())
        expect = defined[np.clip(seq, 0, 20)] & np.asarray(
            sb.residue_mask
        )[..., None]
        got = np.asarray(chi_mask)
        # wherever a template existed, the chi should be measurable
        lib_ok = np.asarray(lib[1])[np.clip(seq, 0, 20)].any(-1)
        assert (got[lib_ok[..., None] & expect]).mean() > 0.99

    def test_self_graft_reproduces_template(self):
        """The residue the template came from gets its own sidechain back."""
        sb = _sb()
        lib, lib_mask = sidechain_library(sb)
        xyz, mask = build_sidechains(
            sb.xyz[:, :, :3], sb.get_seq_idx(), (lib, lib_mask),
            sb.residue_mask,
        )
        seq = np.asarray(sb.get_seq_idx())
        x0 = np.asarray(sb.xyz)
        x1 = np.asarray(xyz)
        am = np.asarray(sb.atom_mask)
        # find the first complete LEU (a common, chi-rich residue)
        aa = int(AA.LEU)
        for b, l in np.argwhere(seq == aa):
            want = lib_mask[aa]
            if (am[b, l] >= want).all() and np.isfinite(x0[b, l][want]).all():
                np.testing.assert_allclose(
                    x1[b, l][want], x0[b, l][want], atol=2e-3
                )
                break

    def test_pipeline_with_packing(self):
        """Graft + pack on a fresh backbone yields low clash energy."""
        import jax

        from protstruc_tpu.ops.pack import clash_energy, pack_sidechains

        sb = _sb()
        lib = sidechain_library(sb)
        # a compact region's backbone, re-grafted and packed
        sel = np.zeros(sb.chain_idx.shape, bool)
        sel[:, :40] = True
        sub = sb.residue_masked_select(jnp.asarray(sel))
        xyz, mask = build_sidechains(
            sub.xyz[:, :, :3], sub.get_seq_idx(), lib, sub.residue_mask
        )
        seq = sub.get_seq_idx()
        e0 = float(clash_energy(xyz, mask, seq)[0])
        packed, traj = pack_sidechains(
            xyz, seq, mask, jax.random.PRNGKey(0), n_sweeps=10, n_proposals=6
        )
        e1 = float(clash_energy(packed, mask, seq)[0])
        assert e1 <= e0
        assert e1 < 60.0  # grafted-then-packed: no catastrophic overlaps
