from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from commoncrawlnewsdataset_spark.session import get_spark

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ccnews-tests", master="local[4]", shuffle_partitions=4)
    yield s


def _shim_missing_modules():
    """The reference imports tqdm at module top; it isn't installed here and
    is irrelevant to the functions under test — shim a pass-through."""
    if "tqdm" not in sys.modules:
        import types

        fake = types.ModuleType("tqdm")
        fake.tqdm = lambda it=None, *a, **k: it
        sys.modules["tqdm"] = fake


def load_reference_module(relpath: str, name: str):
    """Import a reference script by path (filenames start with digits, and the
    reference is the parity oracle per SURVEY §5 — run its functions
    in-process, never copy them)."""
    _shim_missing_modules()
    spec = importlib.util.spec_from_file_location(name, REFERENCE / relpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_quality():
    return load_reference_module(
        "Project_Scripts/04_compute_quality_metrics.py", "ref_quality"
    )


@pytest.fixture(scope="session")
def ref_sqlite():
    return load_reference_module("Project_Scripts/08_sqlite_setup.py", "ref_sqlite")
