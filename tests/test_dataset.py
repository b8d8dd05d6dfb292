"""Bucketed streaming dataset tests."""

import numpy as np
import pytest

from protstruc_tpu.pdbio.dataset import StructureDataset
from protstruc_tpu.utils.buckets import bucket_length

from tests.conftest import DATA_DIR, pdb_path

ALL_FILES = sorted(str(p) for p in DATA_DIR.glob("*.pdb"))


def test_dataset_covers_all_files():
    ds = StructureDataset(ALL_FILES, batch_size=4)
    total = 0
    for batch in ds:
        b, l = batch.get_batch_size(), batch.n_residues
        assert l == bucket_length(l)  # padded length is a bucket size
        assert b <= 4
        total += b
    assert total == len(ALL_FILES)


def test_dataset_bucket_grouping():
    ds = StructureDataset(ALL_FILES, batch_size=32)
    lengths = {batch.n_residues for batch in ds}
    # every emitted padded length is a bucket
    assert all(l == bucket_length(l) for l in lengths)


def test_dataset_shuffle_changes_order():
    ds = StructureDataset(ALL_FILES, batch_size=1, shuffle=True, seed=1)
    first = [b.get_chain_ids()[0] for b in ds]
    second = [b.get_chain_ids()[0] for b in ds]  # next epoch reshuffles
    assert len(first) == len(second) == len(ALL_FILES)
    assert first != second  # astronomically unlikely to match for 14 files


def test_dataset_drop_remainder():
    ds = StructureDataset(ALL_FILES, batch_size=5, drop_remainder=True)
    for batch in ds:
        assert batch.get_batch_size() == 5


def test_dataset_error_propagates():
    ds = StructureDataset([pdb_path("1REX.pdb"), "/nonexistent.pdb"], batch_size=1)
    with pytest.raises(FileNotFoundError):
        list(ds)


def test_dataset_batches_featurize():
    ds = StructureDataset([pdb_path("1REX.pdb"), pdb_path("4EOT.pdb")], batch_size=2)
    batches = list(ds)
    assert len(batches) == 1
    batch = batches[0]
    assert batch.n_residues == 256  # both bucket to 256
    d, m = batch.backbone_dihedrals()
    assert d.shape == (2, 256, 3)
    assert sorted(np.asarray(batch.get_total_lengths()).tolist()) == [130, 184]


def test_abandoned_iteration_does_not_leak_producer(tmp_path):
    """Breaking out of iteration mid-epoch unblocks the producer thread
    (it must not sit forever in queue.put holding prefetched batches)."""
    import threading
    import time

    from tests.conftest import pdb_path

    paths = [pdb_path("1REX.pdb")] * 6
    ds = StructureDataset(paths, batch_size=1, prefetch=1)
    before = threading.active_count()
    for batch in ds:
        break  # abandon immediately; producer is blocked on a full queue
    deadline = time.time() + 10.0
    while time.time() < deadline:
        if threading.active_count() <= before:
            break
        time.sleep(0.2)
    assert threading.active_count() <= before, "producer thread leaked"


def test_abandoned_iteration_stops_parsing(monkeypatch):
    """Abandoning an epoch must not parse the whole remaining corpus: the
    producer submits lazily (bounded in-flight), so at most a few in-flight
    parses drain after the consumer breaks."""
    import threading
    import time

    import protstruc_tpu.pdbio.parser as parser_mod
    from tests.conftest import pdb_path

    n_parsed = [0]
    real_parse = parser_mod.parse_pdb

    def counting_parse(path):
        n_parsed[0] += 1
        return real_parse(path)

    monkeypatch.setattr(parser_mod, "parse_pdb", counting_parse)
    total = 60
    paths = [pdb_path("1REX.pdb")] * total
    # use_cache=False: the parsed-structure cache would otherwise satisfy
    # 59/60 lookups and mask the lazy-submission behavior under test
    ds = StructureDataset(paths, batch_size=1, prefetch=1, n_workers=2,
                          use_cache=False)
    before = threading.active_count()
    for batch in ds:
        break
    deadline = time.time() + 15.0
    while time.time() < deadline and threading.active_count() > before:
        time.sleep(0.2)
    # bound: prefetch + 2x n_workers in flight + a small race margin,
    # far below the 60-file corpus the eager pool.map used to drain
    assert n_parsed[0] <= 20, f"parsed {n_parsed[0]}/{total} after abandon"


def test_parsed_cache_epoch2_hits(monkeypatch):
    """Epoch 2+ must serve every file from the parsed-structure cache:
    zero re-parses, identical batch values."""
    import protstruc_tpu.pdbio.parser as parser_mod
    from protstruc_tpu.pdbio.dataset import clear_parsed_cache

    clear_parsed_cache()
    n_parsed = [0]
    real_parse = parser_mod.parse_pdb

    def counting_parse(path):
        n_parsed[0] += 1
        return real_parse(path)

    monkeypatch.setattr(parser_mod, "parse_pdb", counting_parse)
    paths = [pdb_path("1REX.pdb"), pdb_path("4EOT.pdb")]
    ds = StructureDataset(paths, batch_size=2)
    b1 = list(ds)[0]
    assert n_parsed[0] == 2
    b2 = list(ds)[0]  # epoch 2: all cache hits
    assert n_parsed[0] == 2
    np.testing.assert_array_equal(np.asarray(b1.atom_mask),
                                  np.asarray(b2.atom_mask))
    x1 = np.nan_to_num(np.asarray(b1.xyz), nan=-9.0)
    np.testing.assert_array_equal(
        x1, np.nan_to_num(np.asarray(b2.xyz), nan=-9.0))


def test_parsed_cache_invalidates_on_mtime(tmp_path, monkeypatch):
    """Editing a file (new mtime/size) must re-parse, not serve stale data."""
    import os
    import shutil

    import protstruc_tpu.pdbio.parser as parser_mod
    from protstruc_tpu.pdbio.dataset import clear_parsed_cache

    clear_parsed_cache()
    p = tmp_path / "s.pdb"
    shutil.copy(pdb_path("1REX.pdb"), p)
    n_parsed = [0]
    real_parse = parser_mod.parse_pdb

    def counting_parse(path):
        n_parsed[0] += 1
        return real_parse(path)

    monkeypatch.setattr(parser_mod, "parse_pdb", counting_parse)
    list(StructureDataset([str(p)], batch_size=1))
    assert n_parsed[0] == 1
    shutil.copy(pdb_path("4EOT.pdb"), p)  # different content + size
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    (b,) = list(StructureDataset([str(p)], batch_size=1))
    assert n_parsed[0] == 2
    assert int(b.get_total_lengths()[0]) == 184  # 4EOT, not stale 1REX (130)


def test_parsed_cache_budget_eviction():
    """The LRU respects its byte budget and never grows unbounded."""
    from protstruc_tpu.pdbio.dataset import _ParsedLRU
    from protstruc_tpu.pdbio.parser import parse_pdb

    parsed = parse_pdb(pdb_path("1REX.pdb"))
    one = sum(getattr(v, "nbytes", 64) for v in vars(parsed).values())
    lru = _ParsedLRU(max_bytes=int(2.5 * one))
    for i in range(5):
        lru.put(("k", i, 0), parsed)
    st = lru.stats()
    assert st["entries"] == 2 and st["bytes"] <= lru.max_bytes
    # oldest evicted, newest present
    assert lru.get(("k", 0, 0)) is None
    assert lru.get(("k", 4, 0)) is not None
