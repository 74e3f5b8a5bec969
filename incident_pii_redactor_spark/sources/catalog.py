"""Input-table adapter: Iceberg catalog table or plain Parquet path,
one call site (north rule: "over Iceberg tables"; this sandbox has no
Iceberg runtime jar, so the Parquet branch is what tests exercise —
schemas are identical and the engine never depends on which one it got).

Production session config for the Iceberg branch (documented here, inert
without the runtime jar):

    spark.sql.catalog.cc = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cc.type = glue | hive | rest
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>

Iceberg gives the 10^12-row input what plain directories cannot:
snapshot-isolated reads for resume (read the SAME snapshot across job
retries via ``VERSION AS OF``), partition-pruned manifests instead of
file listing, and hidden-partitioning on ``days(warc_ts)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"

# the authoritative input shape (BASELINE.json input_hint) — declared,
# never inferred: at ~800k input files schema inference is its own
# distributed footer-reading job before any real work starts, and with
# ignoreCorruptFiles enabled an unlucky corrupt first file makes
# inference give up entirely (UNABLE_TO_INFER_SCHEMA) even though every
# data task would have succeeded
PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def read_pages(spark: SparkSession, source: str,
               snapshot_id: int | None = None) -> DataFrame:
    """Read the pages table from ``iceberg:<catalog.db.table>`` or a
    parquet path. ``snapshot_id`` pins an Iceberg snapshot (resume runs
    MUST pin one so retries see identical input)."""
    if source.startswith(ICEBERG_PREFIX):
        table = source[len(ICEBERG_PREFIX):]
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(table)
    if snapshot_id is not None:
        raise ValueError(
            "snapshot pinning requires an iceberg: source — a plain parquet "
            "path cannot guarantee retries see identical input"
        )
    df = spark.read.schema(PAGES_SCHEMA).parquet(source)
    # Declared schemas NULL-fill columns the files don't actually carry
    # — a renamed `text` column would silently read as all-NULL and the
    # pipeline would write a garbage corpus (review round 3). A 100-row
    # sample probe restores the fail-fast that inference used to give,
    # without inference's distributed footer job.
    sample = df.select("url", "text").limit(100).collect()
    if sample and all(r.url is None and r.text is None for r in sample):
        raise ValueError(
            f"read_pages: {source} matched the declared schema by "
            "NULL-filling — url and text are all NULL in a 100-row "
            "sample. The files likely carry different column names."
        )
    return df
