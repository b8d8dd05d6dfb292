"""Host-side PDB I/O: parsing, fetching (cache-first) and writing.

Replaces the reference's biotite/pandas layer (pdb.py, io.py) with a
dependency-free implementation: a fixed-column PDB parser with the same
tidy/gap-fill/slot-scatter semantics, an optional C++ fast path for the
atom-record scan, a cache-first RCSB fetcher, and a PDB writer.
"""

from protstruc_tpu.pdbio.parser import ParsedStructure, parse_pdb, parse_pdb_files
from protstruc_tpu.pdbio.pdb import PDB, ChothiaAntibodyPDB
from protstruc_tpu.pdbio.writer import to_pdb, structure_batch_to_pdb
from protstruc_tpu.pdbio.fetch import fetch_pdb
from protstruc_tpu.pdbio.dataset import StructureDataset
from protstruc_tpu.pdbio.annotations import (
    SSRecord, author_ss_classes, parse_ss_records)
