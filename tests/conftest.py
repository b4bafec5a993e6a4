from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from app_fastdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Hermetic index root: tests build persisted index artifacts
# (cache.persisted_get) for throwaway tmp corpora; pointing the root at
# a per-run tmp dir keeps the repo's .index/ clean and every test run
# cold. Set BEFORE any SparkSession work so all consumers agree.
if "SPARK_GRAFT_INDEX_DIR" not in os.environ:
    import atexit
    import shutil
    import tempfile

    _index_tmp = tempfile.mkdtemp(prefix="spark_graft_index_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = _index_tmp
    # remove on interpreter exit — repeated runs must not accumulate
    # parquet index trees in /tmp
    atexit.register(shutil.rmtree, _index_tmp, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
