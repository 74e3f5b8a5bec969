"""North-rule packaging requirement: the job runs under
``spark-submit --py-files engine.zip`` from a NEUTRAL cwd, so the
package resolves only through the shipped zip (what a real cluster
submit looks like — the Makefile's ``submit-smoke`` as a pytest gate)."""

from __future__ import annotations

import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_package(tmp_path):
    from incident_pii_redactor_spark.sources.pages import (
        write_pages_parquet,
    )

    zip_path = str(tmp_path / "engine.zip")
    pkg = os.path.join(REPO, "incident_pii_redactor_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    write_pages_parquet(str(tmp_path / "pages.parquet"), 300)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak in from the repo
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--py-files", zip_path,
         "--conf", "spark.ui.enabled=false",
         os.path.join(REPO, "jobs", "scrub.py"),
         "--input", str(tmp_path / "pages.parquet"),
         "--output", str(tmp_path / "out"),
         "--manifest", str(tmp_path / "mf"),
         "--n-buckets", "4", "--bucket-group-size", "4"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    import glob

    import pyarrow.parquet as pq

    # the output partitions by _bucket=K: the underscore prefix makes
    # pyarrow.dataset skip the dirs as metadata, so count files directly
    files = glob.glob(str(tmp_path / "out" / "**" / "*.parquet"),
                      recursive=True)
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert n > 0
