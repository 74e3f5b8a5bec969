from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from incident_pii_redactor_spark.plans import build_session

    s = build_session("pytest", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """2,000-row deterministic pages fixture (FIXTURES.md F1 small scale)."""
    from incident_pii_redactor_spark.sources.pages import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, 2000)
    return path


@pytest.fixture(scope="session")
def pages_pdf(pages_parquet):
    import pyarrow.parquet as pq

    return pq.read_table(pages_parquet).to_pandas()
