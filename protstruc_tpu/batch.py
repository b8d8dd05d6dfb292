"""StructureBatch: an immutable pytree of batched protein structures.

TPU-first redesign of the reference ``StructureBatch``
(/root/reference/protstruc/protstruc.py:32-956):

* **Pytree dataclass** — registered with JAX; instances flow through
  ``jit`` / ``vmap`` / ``pjit`` / ``lax.scan`` directly and serialize via
  orbax/np.savez for free.
* **Explicit masks + int padding** — ``chain_idx``/``residue_idx`` are int32
  with ``-1`` padding instead of the reference's NaN-padded floats
  (protstruc.py:175-176); NaN does not survive integer dtypes or fast TPU
  paths.  Missing-atom *coordinates* stay NaN exactly like the reference
  (pdb.py:134) so NaN-propagation semantics (e.g. ``center_of_mass`` via
  nanmean, protstruc.py:746-757) are preserved.
* **Functional methods** — manipulators (``translate``/``rotate``/
  ``standardize``/``diffuse_xyz``/``center_at``/``align``) return a new
  batch instead of mutating (the reference mutates in place,
  protstruc.py:679, 694, 733, 878).
* **Fused pair features** — ``inter_residue_geometry`` computes each
  ``(B, L, L)`` map directly; the ``(B, L, L, A, A)`` tensor of
  protstruc.py:455-484 is only materialized by the explicit
  ``pairwise_distance_matrix()`` parity escape hatch.
* **Static shapes everywhere** — top-k patches and masked alignment use
  weights/masks rather than boolean gathers, so everything jit-compiles
  once per (B, L, A) bucket.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from protstruc_tpu import geometry as geom
from protstruc_tpu.constants import MAX_N_ATOMS_PER_RESIDUE
from protstruc_tpu.ops import pairwise as pairwise_ops
from protstruc_tpu.vocab import AA, ATOM, ressymb_to_resindex

__all__ = ["StructureBatch"]

#: Padding sentinel for integer per-residue annotations.
PAD_IDX = -1
#: Fill value used when shifting chain_idx for terminal detection; must
#: differ from both PAD_IDX and any valid chain index.
_SHIFT_FILL = -2


def _as_np(x):
    return None if x is None else np.asarray(x)


def _freeze_chain_ids(chain_ids) -> Optional[Tuple[Tuple[str, ...], ...]]:
    if chain_ids is None:
        return None
    return tuple(tuple(c) for c in chain_ids)


def _freeze_seq(seq) -> Optional[Tuple[Tuple[Tuple[str, str], ...], ...]]:
    if seq is None:
        return None
    return tuple(tuple(sorted(d.items())) if isinstance(d, dict) else tuple(d) for d in seq)


@flax.struct.dataclass
class StructureBatch:
    """A batch of (padded) protein structures as a JAX pytree.

    Array fields (pytree leaves):
        xyz: ``(B, L, A, 3)`` float32 atom coordinates; NaN where an atom is
            absent from the source structure.
        atom_mask: ``(B, L, A)`` bool; True where the atom exists.
        chain_idx: ``(B, L)`` int32 chain index per residue (0-based within
            each structure), ``-1`` at padding.
        residue_idx: ``(B, L)`` int32 author residue numbering (or 0..n-1),
            ``-1`` at padding.
        mu, std: ``(B, 3)`` standardization statistics (present only after
            ``standardize``).

    Static fields (pytree aux data, hashable):
        chain_ids: per-structure tuple of chain-ID strings.
        seq: per-structure tuple of ``(chain_id, sequence)`` pairs.
        standardized: whether coordinates are in standardized space.
    """

    xyz: jnp.ndarray
    atom_mask: jnp.ndarray
    chain_idx: jnp.ndarray
    residue_idx: jnp.ndarray
    mu: Optional[jnp.ndarray] = None
    std: Optional[jnp.ndarray] = None
    chain_ids: Optional[Tuple[Tuple[str, ...], ...]] = flax.struct.field(
        pytree_node=False, default=None
    )
    seq: Optional[Tuple[Tuple[Tuple[str, str], ...], ...]] = flax.struct.field(
        pytree_node=False, default=None
    )
    standardized: bool = flax.struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_xyz(
        cls,
        xyz,
        atom_mask=None,
        chain_idx=None,
        chain_ids: Optional[List[List[str]]] = None,
        seq: Optional[List[Dict[str, str]]] = None,
        residue_idx=None,
    ) -> "StructureBatch":
        """Build a batch from a raw coordinate array.

        Parity: protstruc.py:93-128.  ``xyz``: ``(B, L, A, 3)`` with
        caller-chosen A; ``atom_mask`` defaults to all-True; ``chain_idx``
        must start at 0 per structure (validated host-side) and defaults to
        zeros.  ``chain_idx`` and ``chain_ids`` must be passed together.
        """
        if (chain_idx is None) != (chain_ids is None):
            raise ValueError(
                "Both `chain_idx` and `chain_ids` should be provided or None."
            )

        xyz_np = _as_np(xyz).astype(np.float32)
        bsz, n_res, n_atoms = xyz_np.shape[:3]

        if atom_mask is None:
            am = np.ones((bsz, n_res, n_atoms), dtype=bool)
        else:
            am = _as_np(atom_mask).astype(bool)

        if chain_idx is None:
            ci = np.zeros((bsz, n_res), dtype=np.int32)
        else:
            ci_raw = _as_np(chain_idx)
            ci = np.where(np.isnan(ci_raw.astype(np.float64)), PAD_IDX, ci_raw)
            ci = ci.astype(np.int32)
            for i in range(bsz):
                valid = ci[i][ci[i] != PAD_IDX]
                if valid.size and valid.min() != 0:
                    raise ValueError(
                        f"Protein {i}: Chain index should start from zero"
                    )

        if residue_idx is None:
            ri = np.broadcast_to(np.arange(n_res, dtype=np.int32), (bsz, n_res)).copy()
        else:
            ri_raw = _as_np(residue_idx)
            ri = np.where(np.isnan(ri_raw.astype(np.float64)), PAD_IDX, ri_raw)
            ri = ri.astype(np.int32)

        return cls(
            xyz=jnp.asarray(xyz_np),
            atom_mask=jnp.asarray(am),
            chain_idx=jnp.asarray(ci),
            residue_idx=jnp.asarray(ri),
            chain_ids=_freeze_chain_ids(chain_ids),
            seq=_freeze_seq(seq),
        )

    @classmethod
    def from_pdb(cls, pdb_path: Union[str, List[str]]) -> "StructureBatch":
        """Parse one or more PDB files into a padded batch (A pinned to 15).

        Parity: protstruc.py:130-192; host-side parse + pad, then a single
        device transfer at the padded boundary.
        """
        from protstruc_tpu.pdbio.parser import parse_pdb_files

        paths = pdb_path if isinstance(pdb_path, list) else [pdb_path]
        return cls._from_parsed(parse_pdb_files(paths))

    @classmethod
    def from_pdb_id(cls, pdb_id: Union[str, List[str]]) -> "StructureBatch":
        """Fetch PDB entries (with a local cache) and build a batch.

        Parity: protstruc.py:194-261 (reference fetches from RCSB via
        biotite; here ``pdbio.fetch`` provides a cache-first fetcher that
        works in air-gapped environments when entries are pre-cached).
        """
        from protstruc_tpu.pdbio.fetch import fetch_pdb
        from protstruc_tpu.pdbio.parser import parse_pdb_files

        ids = pdb_id if isinstance(pdb_id, list) else [pdb_id]
        paths = [fetch_pdb(i) for i in ids]
        return cls._from_parsed(parse_pdb_files(paths))

    @classmethod
    def _from_parsed(cls, parsed, target_length=None) -> "StructureBatch":
        """Pad a list of parsed single structures into one batch.

        ``target_length`` pads to a fixed residue count (bucketed data
        loading, pdbio/dataset.py) instead of the batch max.
        """
        bsz = len(parsed)
        max_l = target_length or max(p.n_residues for p in parsed)
        A = MAX_N_ATOMS_PER_RESIDUE

        xyz = np.zeros((bsz, max_l, A, 3), dtype=np.float32)
        atom_mask = np.zeros((bsz, max_l, A), dtype=bool)
        chain_idx = np.full((bsz, max_l), PAD_IDX, dtype=np.int32)
        residue_idx = np.full((bsz, max_l), PAD_IDX, dtype=np.int32)

        chain_ids, seqs = [], []
        for i, p in enumerate(parsed):
            n = p.n_residues
            xyz[i, :n] = p.atom_xyz
            atom_mask[i, :n] = p.atom_mask
            chain_idx[i, :n] = p.chain_idx
            residue_idx[i, :n] = p.residue_idx
            chain_ids.append(p.chain_order)
            seqs.append(p.seq_dict())

        return cls(
            xyz=jnp.asarray(xyz),
            atom_mask=jnp.asarray(atom_mask),
            chain_idx=jnp.asarray(chain_idx),
            residue_idx=jnp.asarray(residue_idx),
            chain_ids=_freeze_chain_ids(chain_ids),
            seq=_freeze_seq(seqs),
        )

    @classmethod
    def from_backbone_orientations_translations(
        cls,
        orientations,
        translations,
        chain_idx=None,
        chain_ids=None,
        seq=None,
        residue_idx=None,
        include_cb: bool = False,
    ) -> "StructureBatch":
        """Place ideal backbones under per-residue rigid frames.

        Parity: protstruc.py:263-319.  ``orientations``: ``(B, L, 3, 3)``,
        ``translations``: ``(B, L, 3)``; atoms padded to A=15 with zero
        coords and False mask.
        """
        orientations = jnp.asarray(_as_np(orientations), dtype=jnp.float32)
        translations = jnp.asarray(_as_np(translations), dtype=jnp.float32)
        bsz, n_res = orientations.shape[:2]

        ideal_bb = geom.ideal_backbone_coordinates((bsz, n_res), include_cb)
        n_atoms = ideal_bb.shape[2]

        atom_xyz = jnp.einsum("bnij,bnaj->bnai", orientations, ideal_bb,
                              precision="highest")
        atom_xyz = atom_xyz + translations[:, :, None, :]

        pad_a = MAX_N_ATOMS_PER_RESIDUE - n_atoms
        atom_xyz = jnp.concatenate(
            [atom_xyz, jnp.zeros((bsz, n_res, pad_a, 3))], axis=-2
        )
        atom_mask = jnp.concatenate(
            [
                jnp.ones((bsz, n_res, n_atoms), dtype=bool),
                jnp.zeros((bsz, n_res, pad_a), dtype=bool),
            ],
            axis=-1,
        )

        base = cls.from_xyz(
            np.asarray(atom_xyz),
            np.asarray(atom_mask),
            chain_idx=_as_np(chain_idx),
            chain_ids=chain_ids,
            seq=seq,
            residue_idx=_as_np(residue_idx),
        )
        return base

    @classmethod
    def from_sequence(
        cls,
        seqs: Union[str, List[str]],
        phi: float = -2.094,
        psi: float = 2.094,
        omega: float = math.pi,
    ) -> "StructureBatch":
        """Initialize extended-chain backbones from amino-acid sequences.

        New convenience constructor (not in the reference): builds uniform
        (phi, psi, omega) torsions — default extended/beta conformation —
        folds them with the NeRF chain, and attaches sequence metadata so
        ``get_seq_idx`` works.  Ragged sequences are padded to the longest.
        """
        seqs = [seqs] if isinstance(seqs, str) else list(seqs)
        bsz = len(seqs)
        max_l = max(len(s) for s in seqs)

        tor = np.zeros((bsz, max_l, 3), np.float32)
        tor[..., 0], tor[..., 1], tor[..., 2] = phi, psi, omega

        base = cls.from_dihedrals(tor)
        # ragged padding rows must carry the class invariants (PAD_IDX in
        # the int fields, not 0/arange): otherwise the shorter structures'
        # true C-termini go undetected (chain_idx 0 == 0 across the
        # boundary) and get_chain_mask matches padding as chain code 0
        atom_mask = np.array(base.atom_mask)  # writable copies
        chain_idx = np.array(base.chain_idx)
        residue_idx = np.array(base.residue_idx)
        for i, s in enumerate(seqs):
            atom_mask[i, len(s):] = False
            chain_idx[i, len(s):] = PAD_IDX
            residue_idx[i, len(s):] = PAD_IDX
        return base.replace(
            atom_mask=jnp.asarray(atom_mask),
            chain_idx=jnp.asarray(chain_idx),
            residue_idx=jnp.asarray(residue_idx),
            chain_ids=_freeze_chain_ids([["A"]] * bsz),
            seq=_freeze_seq([{"A": s} for s in seqs]),
        )

    @classmethod
    def from_dihedrals(
        cls,
        dihedrals,
        chain_idx=None,
        chain_ids=None,
        seq=None,
    ) -> "StructureBatch":
        """Fold a backbone from (phi, psi, omega) torsions via a NeRF chain.

        The reference declares this constructor but leaves it a stub
        (protstruc.py:321-339); here it is implemented with sequential
        atom placement under ``lax.scan`` (ops/nerf.py).
        ``dihedrals``: ``(B, L, 3)`` in radians.
        """
        from protstruc_tpu.ops.nerf import backbone_from_dihedrals

        dihedrals = jnp.asarray(_as_np(dihedrals), dtype=jnp.float32)
        xyz4 = backbone_from_dihedrals(dihedrals)  # (B, L, 4, 3) N/CA/C/O
        bsz, n_res = xyz4.shape[:2]
        pad_a = MAX_N_ATOMS_PER_RESIDUE - xyz4.shape[2]
        xyz = jnp.concatenate([xyz4, jnp.zeros((bsz, n_res, pad_a, 3))], axis=-2)
        atom_mask = np.zeros((bsz, n_res, MAX_N_ATOMS_PER_RESIDUE), dtype=bool)
        atom_mask[:, :, : xyz4.shape[2]] = True
        return cls.from_xyz(
            np.asarray(xyz), atom_mask, chain_idx=_as_np(chain_idx),
            chain_ids=chain_ids, seq=seq,
        )

    # ------------------------------------------------------------------
    # basic accessors (parity: protstruc.py:341-433)
    # ------------------------------------------------------------------

    @property
    def batch_size(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_residues(self) -> int:
        return self.xyz.shape[1]

    @property
    def max_n_atoms_per_residue(self) -> int:
        return self.xyz.shape[2]

    @property
    def residue_mask(self) -> jnp.ndarray:
        """``(B, L)`` bool: any atom present (protstruc.py:69)."""
        return self.atom_mask.any(axis=-1)

    def get_batch_size(self) -> int:
        return self.batch_size

    def get_xyz(self) -> jnp.ndarray:
        return self.xyz

    def get_atom_mask(self) -> jnp.ndarray:
        return self.atom_mask

    def get_residue_mask(self) -> jnp.ndarray:
        """CA-slot mask — *not* the any-atom mask; parity protstruc.py:372-378."""
        return self.atom_mask[:, :, int(ATOM.CA)]

    def get_chain_idx(self) -> jnp.ndarray:
        return self.chain_idx

    def get_chain_ids(self) -> Optional[List[List[str]]]:
        if self.chain_ids is None:
            return None
        return [list(c) for c in self.chain_ids]

    def get_seq(self) -> Optional[List[Dict[str, str]]]:
        if self.seq is None:
            return None
        return [dict(s) for s in self.seq]

    def get_chain_mask(self, chain_id: str) -> jnp.ndarray:
        """``(B, L)`` bool: residues belonging to the named chain per structure.

        Convenience addition (not in the reference): maps the chain-ID string
        to each structure's chain index and compares.
        """
        if self.chain_ids is None:
            raise ValueError("chain ids not available")
        codes = np.array(
            [cids.index(chain_id) if chain_id in cids else -99
             for cids in self.chain_ids],
            dtype=np.int32,
        )
        return self.chain_idx == jnp.asarray(codes)[:, None]

    def get_max_n_residues(self) -> int:
        return self.n_residues

    def get_max_n_atoms_per_residue(self) -> int:
        return self.max_n_atoms_per_residue

    def get_seq_idx(self) -> jnp.ndarray:
        """``(B, L)`` int32 residue-type indices, UNK at padding.

        Parity: protstruc.py:394-409 (host loop over python strings).
        """
        if self.seq is None or self.chain_ids is None:
            raise ValueError("sequence information not available")
        out = np.full((self.batch_size, self.n_residues), int(AA.UNK), np.int32)
        for i, (seq_pairs, cids) in enumerate(zip(self.seq, self.chain_ids)):
            d = dict(seq_pairs)
            concat = "".join(d[c] for c in cids)
            # truncate defensively: selection ops leave seq metadata stale
            # (as in the reference, protstruc.py:926-929, whose get_seq_idx
            # would crash on such batches)
            n = min(len(concat), self.n_residues)
            out[i, :n] = [ressymb_to_resindex[r] for r in concat[:n]]
        return jnp.asarray(out)

    def get_total_lengths(self) -> jnp.ndarray:
        """Index of last valid residue + 1 per structure (protstruc.py:411-422)."""
        rm = self.residue_mask.astype(jnp.int32)
        return jnp.argmax(jnp.cumsum(rm, axis=1), axis=1) + 1

    # ------------------------------------------------------------------
    # terminal masks (parity: protstruc.py:435-453)
    # ------------------------------------------------------------------

    def get_n_terminal_mask(self) -> jnp.ndarray:
        """True at the first residue of every chain. ``(B, L)`` bool."""
        prev = jnp.pad(
            self.chain_idx[:, :-1], ((0, 0), (1, 0)), constant_values=_SHIFT_FILL
        )
        return (self.chain_idx != prev) & self.residue_mask

    def get_c_terminal_mask(self) -> jnp.ndarray:
        """True at the last residue of every chain. ``(B, L)`` bool."""
        nxt = jnp.pad(
            self.chain_idx[:, 1:], ((0, 0), (0, 1)), constant_values=_SHIFT_FILL
        )
        return (self.chain_idx != nxt) & self.residue_mask

    # ------------------------------------------------------------------
    # featurization
    # ------------------------------------------------------------------

    def pairwise_distance_matrix(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full ``(B, L, L, A, A)`` all-atom distance tensor + mask.

        Parity escape hatch (protstruc.py:455-484).  Memory-heavy: prefer
        ``pairwise_atom_distance`` / ``inter_residue_geometry`` which never
        materialize the A x A axis.
        """
        return pairwise_ops.full_pairwise_distance_matrix(self.xyz, self.atom_mask)

    def pairwise_atom_distance(
        self, atom_i: str = "CA", atom_j: str = "CA"
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused single-slice ``(B, L, L)`` distance map + mask (TPU-native API)."""
        return pairwise_ops.pairwise_atom_distance(
            self.xyz, self.atom_mask, atom_i, atom_j
        )

    def backbone_dihedrals(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Backbone (phi, psi, omega) per residue + definedness mask.

        Parity: protstruc.py:486-541 — zero-filled at undefined positions,
        zeroed at chain N-terms (phi) / C-terms (psi, omega); mask is
        ``~[nterm, cterm, cterm] & residue_mask``.  Chain-break handling
        comes solely from the terminal masks (reference limitation kept).
        """
        return _backbone_dihedrals(
            self.xyz, self.chain_idx, self.atom_mask
        )

    def backbone_orientations(
        self, a1: str = "N", a2: str = "CA", a3: str = "C"
    ) -> jnp.ndarray:
        """Per-residue Gram-Schmidt frames ``(B, L, 3, 3)`` (protstruc.py:543-571)."""
        return geom.gram_schmidt(
            self.xyz[:, :, int(ATOM[a1])],
            self.xyz[:, :, int(ATOM[a2])],
            self.xyz[:, :, int(ATOM[a3])],
        )

    def backbone_translations(self, atom: str = "CA") -> jnp.ndarray:
        """Coordinates of a backbone atom per residue ``(B, L, 3)`` (protstruc.py:573-587)."""
        return self.xyz[:, :, int(ATOM[atom])]

    def split_chains(self) -> List["StructureBatch"]:
        """Split a B=1 batch into one batch per chain (host-side convenience).

        Each result keeps only its chain's residues with chain_idx renumbered
        to 0 and metadata restricted to that chain.
        """
        if self.batch_size != 1:
            raise ValueError("split_chains is defined for batch size 1")
        if self.chain_ids is None:
            raise ValueError("chain ids not available")

        out = []
        for code, cid in enumerate(self.chain_ids[0]):
            sel = np.asarray(self.chain_idx[0]) == code
            sub = self.residue_masked_select(sel[None])
            sub = sub.replace(
                chain_idx=jnp.zeros_like(sub.chain_idx),
                chain_ids=((cid,),),
                seq=((
                    (cid, dict(self.seq[0])[cid]),
                ),) if self.seq is not None else None,
            )
            out.append(sub)
        return out

    def interface_residues(
        self, cutoff: float = 8.0, atom: str = "CB"
    ) -> jnp.ndarray:
        """Residues in contact with a *different* chain. ``(B, L)`` bool.

        A residue is interfacial when any residue of another chain has the
        chosen atom within ``cutoff`` Angstrom (CB by default; glycines fall
        back to nothing unless ``atom="CA"``).  Fused (B, L, L) computation.
        """
        d, m = self.pairwise_atom_distance(atom, atom)
        other_chain = self.chain_idx[:, :, None] != self.chain_idx[:, None, :]
        valid = m & other_chain & (self.chain_idx >= 0)[:, None, :]
        contact = jnp.nan_to_num(d, nan=jnp.inf) < cutoff
        return (contact & valid).any(axis=2) & self.residue_mask

    def secondary_structure(self) -> jnp.ndarray:
        """DSSP-style 3-class secondary structure per residue.

        ``(B, L)`` int32: 0 coil, 1 helix, 2 strand (ops/secondary.py —
        Kabsch-Sander H-bonds from backbone coordinates).
        """
        from protstruc_tpu.ops.secondary import assign_secondary_structure

        xyz = jnp.nan_to_num(self.xyz, nan=0.0)
        ss, _ = assign_secondary_structure(
            xyz[:, :, int(ATOM.N)],
            xyz[:, :, int(ATOM.CA)],
            xyz[:, :, int(ATOM.C)],
            xyz[:, :, int(ATOM.O)],
            self.residue_mask,
            chain_idx=self.chain_idx,
        )
        return ss

    def sasa(self, probe: float = 1.4, n_points: int = 92,
             per_atom: bool = False) -> jnp.ndarray:
        """Shrake-Rupley solvent-accessible surface area, ``(B, L)`` A^2.

        Device-side all-atom SASA (ops/surface.py) — an analysis the
        reference delegates to external tools entirely.  Requires sequences
        (for per-slot vdW radii).
        """
        from protstruc_tpu.ops.surface import sasa as _sasa

        return _sasa(self.xyz, self.atom_mask, self.get_seq_idx(),
                     probe=probe, n_points=n_points, per_atom=per_atom)

    def radius_of_gyration(self) -> jnp.ndarray:
        """Radius of gyration over valid atoms, ``(B,)`` angstrom."""
        from protstruc_tpu.ops.surface import radius_of_gyration as _rg

        return _rg(self.xyz, self.atom_mask)

    def contact_order(self, cutoff: float = 8.0,
                      relative: bool = True) -> jnp.ndarray:
        """(Relative) contact order from CA coordinates, ``(B,)``."""
        from protstruc_tpu.ops.surface import contact_order as _co

        return _co(self.xyz[:, :, int(ATOM.CA)], self.residue_mask,
                   cutoff=cutoff, relative=relative,
                   chain_idx=self.chain_idx)

    def lddt_to(self, other: "StructureBatch", per_residue: bool = False,
                cutoff: float = 15.0) -> jnp.ndarray:
        """CA lDDT of self against a reference batch (superposition-free)."""
        from protstruc_tpu.ops.metrics import lddt as _lddt

        ca_s = jnp.nan_to_num(self.xyz[:, :, int(ATOM.CA)], nan=1e6)
        ca_o = jnp.nan_to_num(other.xyz[:, :, int(ATOM.CA)], nan=1e6)
        mask = (
            self.get_residue_mask()
            & other.get_residue_mask()
            & jnp.isfinite(self.xyz[:, :, int(ATOM.CA)]).all(-1)
            & jnp.isfinite(other.xyz[:, :, int(ATOM.CA)]).all(-1)
        )
        return _lddt(ca_s, ca_o, mask=mask, cutoff=cutoff,
                     per_residue=per_residue)

    def chi_angles(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sidechain chi1-chi4 torsions ``(B, L, 4)`` + mask (ops/chi.py).

        Completes the torsion surface beyond ``backbone_dihedrals``
        (reference protstruc.py:486-541 stops at phi/psi/omega).
        """
        from protstruc_tpu.ops.chi import chi_angles as _chi

        return _chi(self.xyz, self.get_seq_idx(), self.atom_mask)

    def rotate_chi(self, delta: jnp.ndarray) -> "StructureBatch":
        """Rigidly rotate sidechains by ``delta (B, L, 4)`` radians per chi.

        Returns a new batch (functional, like translate/rotate).
        """
        from protstruc_tpu.ops.chi import rotate_chi as _rot

        xyz = _rot(self.xyz, self.get_seq_idx(), delta, self.atom_mask)
        return self.replace(xyz=xyz)

    def ramachandran_classes(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-residue Ramachandran classification (ops/rama.py).

        Returns ``(classes (B, L) int32, valid (B, L) bool)``:
        0 favored / 1 allowed / 2 outlier over residues with defined
        phi AND psi; reduce with ``valid`` for structure-level fractions.
        """
        from protstruc_tpu.ops.rama import ramachandran_classes as _rama

        d, m = self.backbone_dihedrals()
        phi, psi = d[..., 0], d[..., 1]
        valid = (m[..., 0] & m[..., 1]
                 & jnp.isfinite(phi) & jnp.isfinite(psi))
        cls = _rama(jnp.nan_to_num(phi), jnp.nan_to_num(psi),
                    self.get_seq_idx(), valid)
        return cls, valid

    def secondary_structure_8(self) -> jnp.ndarray:
        """Full 8-class DSSP assignment per residue, ``(B, L)`` int32.

        Codes per ``ops.secondary.SS8_LETTERS`` ("CHEGIBTS"): alpha/3-10/pi
        helices, strand/isolated bridge, H-bonded turn, bend, coil.
        """
        from protstruc_tpu.ops.secondary import assign_secondary_structure_8

        xyz = jnp.nan_to_num(self.xyz, nan=0.0)
        return assign_secondary_structure_8(
            xyz[:, :, int(ATOM.N)],
            xyz[:, :, int(ATOM.CA)],
            xyz[:, :, int(ATOM.C)],
            xyz[:, :, int(ATOM.O)],
            self.residue_mask,
            chain_idx=self.chain_idx,
        )

    def clash_energy(self, tolerance: float = 0.4) -> jnp.ndarray:
        """Inter-residue vdW-overlap clash energy, ``(B,)`` (ops/pack.py)."""
        from protstruc_tpu.ops.pack import clash_energy as _clash

        return _clash(self.xyz, self.atom_mask, self.get_seq_idx(),
                      tolerance=tolerance)

    def pack_sidechains(self, key, **kwargs) -> "StructureBatch":
        """Repack sidechain chis to minimize clashes; returns a new batch."""
        from protstruc_tpu.ops.pack import pack_sidechains as _pack

        xyz, _ = _pack(self.xyz, self.get_seq_idx(), self.atom_mask, key,
                       **kwargs)
        return self.replace(xyz=xyz)

    def relax(self, **kwargs) -> Tuple["StructureBatch", dict]:
        """Gradient-relax coordinates against bonded + clash energy.

        Returns ``(relaxed_batch, energies)`` (ops/relax.py: adam under
        ``lax.scan``, missing atoms frozen, optional tether to the input).
        """
        from protstruc_tpu.ops.relax import relax_structure

        xyz, energies = relax_structure(
            self.xyz, self.atom_mask, self.get_seq_idx(), self.chain_idx,
            **kwargs)
        return self.replace(xyz=xyz), energies

    def get_local_xyz(self) -> jnp.ndarray:
        """Atom coordinates rotated into each residue's local frame.

        Numerical parity with protstruc.py:347-362, including its quirk of
        subtracting the CA coordinate *after* the rotation
        (``R^T x - x_CA``, not ``R^T (x - x_CA)``).
        """
        orientation = self.backbone_orientations()  # (B, L, 3, 3)
        local = jnp.einsum("bnji,bnaj->bnai", orientation, self.xyz,
                           precision="highest")
        return local - self.xyz[:, :, int(ATOM.CA), None, :]

    def pairwise_dihedrals(
        self, atoms_i: Sequence[str], atoms_j: Sequence[str]
    ) -> jnp.ndarray:
        """``(B, L, L)`` inter-residue dihedral map (protstruc.py:620-640)."""
        return pairwise_ops.pairwise_dihedral_maps(
            self.xyz, tuple(atoms_i), tuple(atoms_j)
        )

    def pairwise_planar_angles(
        self, atoms_i: Sequence[str], atoms_j: Sequence[str]
    ) -> jnp.ndarray:
        """``(B, L, L)`` inter-residue planar-angle map (protstruc.py:642-660)."""
        return pairwise_ops.pairwise_planar_angle_maps(
            self.xyz, tuple(atoms_i), tuple(atoms_j)
        )

    def inter_residue_geometry(self, use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
        """trRosetta 6D inter-residue geometry (protstruc.py:790-817).

        Returns d_ca/d_cb/d_no distance maps (+ masks), omega/theta pair
        dihedrals and phi planar angles, each ``(B, L, L)`` — computed as
        fused maps (optionally via the tiled Pallas kernel) without ever
        materializing the reference's ``(B, L, L, A, A)`` tensor.
        """
        if use_pallas:
            from protstruc_tpu.ops.pallas_pairwise import trrosetta_features

            return trrosetta_features(self.xyz, self.atom_mask)
        return _inter_residue_geometry(self.xyz, self.atom_mask)

    # ------------------------------------------------------------------
    # rigid manipulation (functional; parity: protstruc.py:662-788)
    # ------------------------------------------------------------------

    def translate(self, translation, atomwise: bool = False) -> "StructureBatch":
        """Translate by ``(B, L, 3)`` (residue-wise) or ``(B, L, A, 3)`` (atomwise)."""
        t = jnp.asarray(translation)
        if not atomwise:
            t = t[:, :, None, :]
        return self.replace(xyz=self.xyz + t)

    def rotate(self, rotation) -> "StructureBatch":
        """Rotate by ``(3, 3)`` (shared) or ``(B, 3, 3)`` (per-structure)."""
        r = jnp.asarray(rotation)
        if r.ndim == 2:
            r = r[None]
        new_xyz = jnp.einsum("bij,bnaj->bnai", r, self.xyz, precision="highest")
        return self.replace(xyz=new_xyz)

    def standardize(self, atom_mask=None, residue_mask=None) -> "StructureBatch":
        """Shift/scale coordinates to zero mean, unit per-component std.

        Parity: protstruc.py:696-734 (statistics over masked atoms; std is
        per xyz-component, shape ``(B, 3)``).  The reference's tensor-mask
        truthiness bug (protstruc.py:713-715) is fixed: masks are combined
        with ``is not None`` checks.
        """
        if atom_mask is not None and residue_mask is not None:
            raise ValueError("Only one of atom_mask and residue_mask can be specified.")
        if self.standardized:
            raise ValueError("Coordinates are already standardized.")

        if atom_mask is not None:
            am = jnp.asarray(atom_mask, dtype=bool) & self.atom_mask
        elif residue_mask is not None:
            am = jnp.asarray(residue_mask, dtype=bool)[:, :, None] & self.atom_mask
        else:
            am = self.atom_mask

        new_xyz, mu, std = _standardize(self.xyz, am)
        return self.replace(xyz=new_xyz, mu=mu, std=std, standardized=True)

    def unstandardize(self) -> "StructureBatch":
        """Invert ``standardize`` (protstruc.py:736-744)."""
        if not self.standardized:
            raise ValueError("Cannot unstandardize structures that are not standardized.")
        new_xyz = self.xyz * self.std[:, None, None, :] + self.mu[:, None, None, :]
        return self.replace(xyz=new_xyz, mu=None, std=None, standardized=False)

    def center_of_mass(self) -> jnp.ndarray:
        """CA-only center of mass via nanmean, ``(B, 3)`` (protstruc.py:746-757)."""
        return jnp.nanmean(self.xyz[:, :, int(ATOM.CA)], axis=1)

    def center_at(self, center=None) -> "StructureBatch":
        """Translate so the CA center-of-mass lands at ``center`` (default origin).

        Parity: protstruc.py:759-788 including shape validation.
        """
        if center is None:
            center = jnp.zeros((1, 3))
        center = jnp.asarray(center)
        if center.ndim > 2 or center.shape[-1] != 3:
            raise ValueError(
                f"`center` must have a shape of (batch_size, 3) or (3,), got {center.shape}."
            )
        if center.ndim == 2 and center.shape[0] not in (1, self.batch_size):
            raise ValueError(
                f"`center` must have a shape of (batch_size, 3) or (3,), got {center.shape}."
            )
        if center.ndim == 1:
            center = center[None]

        translation = center - self.center_of_mass()
        return self.replace(xyz=self.xyz + translation[:, None, None, :])

    # ------------------------------------------------------------------
    # diffusion / alignment / selection
    # ------------------------------------------------------------------

    def diffuse_xyz(self, key: jax.Array, beta) -> "StructureBatch":
        """One DDPM forward step with explicit PRNG key.

        ``xyz' = sqrt(1-beta) * xyz + sqrt(beta) * eps`` with ``beta`` of
        shape ``(B,)``.  Parity: protstruc.py:864-878 (reference uses the
        global torch RNG; here the key is explicit so the step can live
        inside ``lax.scan`` — see ops/diffusion.py for the fused loop).
        """
        beta = jnp.asarray(beta, dtype=self.xyz.dtype)
        new_xyz = _diffuse_step(self.xyz, key, beta)
        return self.replace(xyz=new_xyz)

    def align(
        self, target: "StructureBatch", atom_mask=None
    ) -> Tuple["StructureBatch", Tuple[jnp.ndarray, jnp.ndarray]]:
        """Kabsch-align onto ``target``; returns (aligned_batch, (R, t)).

        TPU-native redesign of protstruc.py:880-918: instead of the
        reference's per-structure host loop with ragged boolean gathers, a
        batched mask-*weighted* Kabsch runs fully on device with static
        shapes.  ``target`` batch size must be 1 (broadcast) or equal.
        """
        if target.batch_size != 1 and self.batch_size != target.batch_size:
            raise ValueError("Batch size of the two structures must be the same.")

        if atom_mask is None:
            am = self.atom_mask & target.atom_mask
        else:
            am = jnp.asarray(atom_mask, dtype=bool)

        src = self.xyz.reshape(self.batch_size, -1, 3)
        tgt = jnp.broadcast_to(
            target.xyz, (self.batch_size,) + target.xyz.shape[1:]
        ).reshape(self.batch_size, -1, 3)
        w = jnp.broadcast_to(am, (self.batch_size,) + am.shape[1:]).reshape(
            self.batch_size, -1
        )

        r, t = geom.masked_kabsch(src, tgt, w)
        aligned = self.rotate(r).translate(t[:, None, :])
        return aligned, (r, t)

    def get_topk_nearest_residue_mask(
        self, query_xyz, k: int = 128, mask=None
    ) -> jnp.ndarray:
        """Top-k nearest residues (CA distance) to a set of query points.

        Batched TPU redesign of protstruc.py:819-862: the reference is
        restricted to B=1 and clips ``k`` dynamically; here any batch size
        works and ``k`` stays static — residues beyond the number of valid
        candidates are excluded by a distance-validity check, reproducing
        the reference's clipping semantics with static shapes.

        Args:
            query_xyz: ``(Q, 3)`` or ``(B, Q, 3)`` query points.
            k: max number of neighbours.
            mask: optional ``(B, L)`` candidate restriction.

        Returns: ``(B, L)`` bool.
        """
        q = jnp.asarray(query_xyz)
        if q.ndim == 2:
            q = q[None]
        ca = self.xyz[:, :, int(ATOM.CA)]  # (B, L, 3)
        dist = jnp.linalg.norm(ca[:, :, None, :] - q[:, None, :, :], axis=-1)
        dist = jnp.min(dist, axis=-1)  # (B, L)

        valid = self.residue_mask
        if mask is not None:
            valid = valid & jnp.asarray(mask, dtype=bool)
        big = jnp.asarray(1e9, dist.dtype)
        # residues with atoms but no CA produce NaN distances, and NaN
        # sorts ABOVE every value in top_k's total order — it would steal
        # k-slots from genuinely nearest residues; send them to the
        # excluded band instead
        dist = jnp.where(valid & jnp.isfinite(dist), dist, big)

        k = min(k, self.n_residues)
        neg_top, idx = jax.lax.top_k(-dist, k)  # smallest k distances
        picked_valid = -neg_top < big  # excludes masked/overflow picks
        out = jnp.zeros(dist.shape, dtype=bool)
        out = jax.vmap(lambda o, i, pv: o.at[i].set(pv))(out, idx, picked_valid)
        return out

    def residue_masked_select(self, mask) -> "StructureBatch":
        """Gather the residues selected by ``mask`` into a smaller batch.

        Host-side ragged op, B=1 only (parity: protstruc.py:920-956;
        ``chain_ids``/``seq`` intentionally left stale like the reference).
        For an on-device static-shape alternative see ``residue_compact``.
        """
        if self.batch_size > 1:
            raise ValueError(
                "residue_masked_select method is not defined "
                "for a StructureBatch with batch size > 1."
            )
        m = np.asarray(mask)
        if m.dtype != bool:
            raise ValueError("Mask must be a boolean tensor.")
        if m.ndim == 1:
            m = m[None]
        if m.shape != (self.batch_size, self.n_residues):
            raise ValueError(
                f"Mask shape {m.shape} does not match residue mask shape "
                f"{(self.batch_size, self.n_residues)}."
            )

        sel = m[0]
        return StructureBatch(
            xyz=self.xyz[:, sel],
            atom_mask=self.atom_mask[:, sel],
            chain_idx=self.chain_idx[:, sel],
            residue_idx=self.residue_idx[:, sel],
            chain_ids=self.chain_ids,
            seq=self.seq,
            # standardization state survives selection (mu/std are (B, 3)
            # per-structure): dropping it would leave standardized
            # coordinates flagged raw — unstandardize() would refuse and
            # a second standardize() would silently double-transform
            mu=self.mu,
            std=self.std,
            standardized=self.standardized,
        )

    def random_crop(self, key: jax.Array, size: int, extras=()):
        """Contiguous random residue window per structure (static size).

        Standard training transform (not in the reference): each structure
        gets an independent window of ``size`` residues starting uniformly
        inside its valid span; shorter structures start at 0 and keep their
        padding. Runs on device (``dynamic_slice`` per structure) and is
        jit/scan-safe.

        ``seq`` metadata cannot follow a traced crop offset and is dropped;
        capture ``get_seq_idx()`` *before* cropping and pass it through
        ``extras`` (a tuple of ``(B, L, ...)`` arrays cropped with the same
        per-structure offsets) if sequence conditioning is needed.  Returns
        the cropped batch, or ``(batch, cropped_extras)`` when ``extras``
        is non-empty.
        """
        if size > self.n_residues:
            raise ValueError(f"crop size {size} > padded length {self.n_residues}")
        lengths = self.get_total_lengths()
        max_start = jnp.maximum(lengths - size, 0)
        u = jax.random.uniform(key, (self.batch_size,))
        starts = (u * (max_start + 1).astype(u.dtype)).astype(jnp.int32)
        starts = jnp.minimum(starts, max_start)

        def crop(x):
            def one(xi, s):
                return jax.lax.dynamic_slice_in_dim(xi, s, size, axis=0)

            return jax.vmap(one)(x, starts)

        cropped = self.replace(
            xyz=crop(self.xyz),
            atom_mask=crop(self.atom_mask),
            chain_idx=crop(self.chain_idx),
            residue_idx=crop(self.residue_idx),
            seq=None,
        )
        if extras:
            return cropped, tuple(crop(jnp.asarray(e)) for e in extras)
        return cropped

    def residue_compact(self, mask) -> "StructureBatch":
        """Device-side mask-and-compact: selected residues moved to the front.

        TPU-friendly alternative to ``residue_masked_select``: output keeps
        the padded length L (static shape), selected residues are packed to
        the front in order, and the remainder is masked out.  Works for any
        batch size and inside jit.
        """
        m = jnp.asarray(mask, dtype=bool)
        order = jnp.argsort(~m, axis=1, stable=True)  # selected first, stable
        count = jnp.sum(m, axis=1, keepdims=True)
        keep = jnp.arange(self.n_residues)[None, :] < count

        def take(x):
            return jnp.take_along_axis(
                x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1
            )

        return self.replace(
            xyz=take(self.xyz),
            atom_mask=take(self.atom_mask) & keep[:, :, None],
            chain_idx=jnp.where(keep, take(self.chain_idx), PAD_IDX),
            residue_idx=jnp.where(keep, take(self.residue_idx), PAD_IDX),
        )


# ---------------------------------------------------------------------------
# jitted compute cores
# ---------------------------------------------------------------------------


@jax.jit
def _backbone_dihedrals(xyz, chain_idx, atom_mask):
    n = xyz[:, :, int(ATOM.N)]
    ca = xyz[:, :, int(ATOM.CA)]
    c = xyz[:, :, int(ATOM.C)]

    residue_mask = atom_mask.any(axis=-1)
    prev = jnp.pad(chain_idx[:, :-1], ((0, 0), (1, 0)), constant_values=_SHIFT_FILL)
    nterm = (chain_idx != prev) & residue_mask
    nxt = jnp.pad(chain_idx[:, 1:], ((0, 0), (0, 1)), constant_values=_SHIFT_FILL)
    cterm = (chain_idx != nxt) & residue_mask

    # phi_i = dih(C_{i-1}, N_i, CA_i, C_i); undefined at i=0 -> left pad
    phi = geom.dihedral(c[:, :-1], n[:, 1:], ca[:, 1:], c[:, 1:])
    phi = jnp.pad(phi, ((0, 0), (1, 0)))
    phi = jnp.where(nterm, 0.0, phi)

    # psi_i = dih(N_i, CA_i, C_i, N_{i+1}); undefined at i=L-1 -> right pad
    psi = geom.dihedral(n[:, :-1], ca[:, :-1], c[:, :-1], n[:, 1:])
    psi = jnp.pad(psi, ((0, 0), (0, 1)))
    psi = jnp.where(cterm, 0.0, psi)

    # omega_i = dih(CA_i, C_i, N_{i+1}, CA_{i+1})
    omega = geom.dihedral(ca[:, :-1], c[:, :-1], n[:, 1:], ca[:, 1:])
    omega = jnp.pad(omega, ((0, 0), (0, 1)))
    omega = jnp.where(cterm, 0.0, omega)

    dihedrals = jnp.stack([phi, psi, omega], axis=-1)
    dihedral_mask = ~jnp.stack([nterm, cterm, cterm], axis=-1)
    dihedral_mask = dihedral_mask & residue_mask[:, :, None]
    return dihedrals, dihedral_mask


@jax.jit
def _inter_residue_geometry(xyz, atom_mask):
    ret = {}
    d_ca, m_ca = pairwise_ops.pairwise_atom_distance(xyz, atom_mask, "CA", "CA")
    d_cb, m_cb = pairwise_ops.pairwise_atom_distance(xyz, atom_mask, "CB", "CB")
    d_no, m_no = pairwise_ops.pairwise_atom_distance(xyz, atom_mask, "N", "O")
    ret["d_ca"], ret["d_ca_mask"] = d_ca, m_ca
    ret["d_cb"], ret["d_cb_mask"] = d_cb, m_cb
    ret["d_no"], ret["d_no_mask"] = d_no, m_no

    ret["omega"] = pairwise_ops.pairwise_dihedral_maps(xyz, ("CA", "CB"), ("CA", "CB"))
    ret["theta"] = pairwise_ops.pairwise_dihedral_maps(xyz, ("N", "CA", "CB"), ("CB",))
    ret["phi"] = pairwise_ops.pairwise_planar_angle_maps(xyz, ("CA", "CB"), ("CB",))
    return ret


@jax.jit
def _standardize(xyz, atom_mask):
    am = atom_mask[..., None]  # (B, L, A, 1)
    counts = jnp.sum(am, axis=(1, 2))  # (B, 1)
    safe = jnp.where(am, jnp.nan_to_num(xyz, nan=0.0), 0.0)
    mu = jnp.sum(safe, axis=(1, 2)) / counts  # (B, 3)
    centered = jnp.nan_to_num(xyz, nan=0.0) - mu[:, None, None, :]
    var = jnp.sum(jnp.where(am, centered**2, 0.0), axis=(1, 2)) / counts
    std = jnp.sqrt(var)
    new_xyz = (xyz - mu[:, None, None, :]) / std[:, None, None, :]
    return new_xyz, mu, std


@jax.jit
def _diffuse_step(xyz, key, beta):
    b = beta.reshape(-1, 1, 1, 1)
    noise = jax.random.normal(key, xyz.shape, dtype=xyz.dtype) * jnp.sqrt(b)
    return jnp.sqrt(1.0 - b) * xyz + noise
