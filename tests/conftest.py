"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must execute before the first ``import jax`` anywhere in the test session so
the XLA flags take effect.  Benchmarks (bench.py) run on the real TPU chip;
unit tests run on CPU so sharding/pjit paths can be exercised with 8 virtual
devices.
"""

import os

# The image pre-sets JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize register() re-forces jax_platforms="axon,cpu" at interpreter
# start; unit tests must run on the local CPU with a virtual 8-device mesh,
# so override both the env var and the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

DATA_DIR = pathlib.Path(__file__).parent / "data"

# from_pdb_id resolves entries from this cache (tests never hit the network)
os.environ["PROTSTRUC_TPU_PDB_CACHE"] = str(DATA_DIR)


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR


def pdb_path(name: str) -> str:
    return str(DATA_DIR / name)
