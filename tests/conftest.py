"""Shared fixtures: one SparkSession and one DuckDB oracle connection
per test session. Tests default to sf0.001 (t1 smoke size) for speed;
set SORA_TEST_SF_DIR=/root/testdata/sf0.01 to run the t2 tier locally.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from sora_spark.catalog import TABLE_NAMES
from sora_spark.session import build_session

SF_DIR = os.environ.get("SORA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # drop replay/roundtrip leftovers from DEAD sessions only — scratch
    # paths are pid-suffixed ("name-<pid>"), and a blanket rmtree here
    # deletes a CONCURRENT pytest process's in-flight roundtrip dirs
    # (observed: qsrc3 flaking only when two suites share the box)
    import shutil

    for root, _dirs, _files in list(os.walk("/root/repo/.scratch")):
        for d in list(_dirs):
            pid = d.rsplit("-", 1)[-1]
            if pid.isdigit() and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    s = build_session(
        app_name="sora-tests",
        master=os.environ.get("SORA_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
