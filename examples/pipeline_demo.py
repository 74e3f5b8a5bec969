"""End-to-end training-data pipeline demo — the Spark-first twin of the
reference's ``examples/parallel_processing_demo.py``: synthesize a pages
corpus, dedup it, run the resumable quality+scrub job, inspect lineage.

Run: python examples/pipeline_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

from incident_pii_redactor_spark.plans import build_session
from incident_pii_redactor_spark.sources.pages import write_pages_parquet
from jobs.dedup import parse_args as dedup_args, run as dedup_run
from jobs.scrub import parse_args as scrub_args, run as scrub_run


def main() -> None:
    spark = build_session("pipeline-demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = Path(tempfile.mkdtemp())

    write_pages_parquet(str(work / "pages.parquet"), 2000)

    print(dedup_run(dedup_args([
        "--input", str(work / "pages.parquet"),
        "--output", str(work / "deduped"), "--mode", "both"]), spark=spark))

    print(scrub_run(scrub_args([
        "--input", str(work / "deduped"),
        "--output", str(work / "scrubbed"),
        "--manifest", str(work / "manifest"),
        "--n-buckets", "8", "--bucket-group-size", "4", "--salt"]),
        spark=spark))

    out = spark.read.parquet(str(work / "scrubbed"))
    out.groupBy("keep", "drop_reason").count().orderBy("count", ascending=False).show()
    spark.read.parquet(str(work / "manifest")).select(
        "partition_id", "rows_in", "rows_kept", "redactions_by_type"
    ).show(truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
