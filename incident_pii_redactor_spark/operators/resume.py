"""Checkpoint-based resume at partition (bucket) granularity.

The reference persists progress in SQLite (``src/database/incident_db.py``)
and is restartable only at whole-file granularity. At 10^12 documents a
run MUST restart where it stopped. Design (SURVEY.md §3.4, FIXTURES.md F4):

* every input row gets a content-derived bucket
  ``pmod(xxhash64(url), n_buckets)`` — stable across runs, cluster sizes,
  and input re-partitioning (file order never matters);
* the job processes buckets in groups, writing output partitioned by
  bucket and appending one manifest row per completed bucket;
* on restart, pending work = input anti-joined against the manifest's
  completed buckets. The manifest is tiny (one row per bucket), so the
  anti join is a **broadcast hash anti join** — zero shuffle of the
  10^12-row side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("input_fingerprint", StringType()),
        StructField("rows_in", LongType()),
        StructField("rows_kept", LongType()),
        StructField("rows_dropped", LongType()),
        StructField("redactions_by_type", MapType(StringType(), LongType())),
        StructField("completed_ts", TimestampType()),
    ]
)

BUCKET_COL = "_bucket"


def with_bucket(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Content-derived bucket id — the unit of resume."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        # ONLY a missing path means "first run". Any other failure
        # (corrupt footer, permissions, storage blip) must raise: treating
        # it as first-run would silently re-append every completed bucket.
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        raise


def completed_buckets(manifest: DataFrame, run_id: str | None = None) -> list[int]:
    m = manifest
    if run_id is not None:
        m = m.filter(F.col("run_id") == run_id)
    return sorted(r[0] for r in m.select("partition_id").distinct().collect())


def pending(df_bucketed: DataFrame, manifest: DataFrame,
            run_id: str | None = None) -> DataFrame:
    """Anti-join input against completed buckets. The manifest side is one
    row per bucket -> forced broadcast, so this never shuffles the input."""
    m = manifest
    if run_id is not None:
        m = m.filter(F.col("run_id") == run_id)
    done = m.select(F.col("partition_id").alias(BUCKET_COL)).distinct()
    return df_bucketed.join(F.broadcast(done), on=BUCKET_COL, how="left_anti")


def manifest_rows_from_output(
    out: DataFrame, run_id: str, completed_ts,
) -> DataFrame:
    """Build one manifest row per bucket from a scrubbed-output DataFrame
    (must carry BUCKET_COL, url, keep, redactions_by_type). Per-bucket
    lineage counters double as the metrics layer (SURVEY.md §2.1 S4)."""
    per_bucket = (
        out.select(
            BUCKET_COL,
            F.explode("redactions_by_type").alias("key", "value"),
        )
        .groupBy(BUCKET_COL, "key")
        .agg(F.sum("value").alias("cnt"))
        .groupBy(BUCKET_COL)
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("key"), F.col("cnt")))
                )
            ).alias("redactions_by_type")
        )
    )
    stats = out.groupBy(BUCKET_COL).agg(
        F.count("*").alias("rows_in"),
        F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("rows_dropped"),
        # order-independent, constant-memory fingerprint of the bucket's url
        # set (a collect_list+md5 would buffer every url per bucket — not
        # viable at 10^12 rows)
        F.hex(F.expr("bit_xor(xxhash64(url))")).alias("input_fingerprint"),
    )
    return (
        stats.join(per_bucket, on=BUCKET_COL, how="left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.col(BUCKET_COL).alias("partition_id"),
            "input_fingerprint",
            "rows_in",
            "rows_kept",
            "rows_dropped",
            # redaction-free buckets: empty map, not null (stable consumers)
            F.coalesce(
                "redactions_by_type",
                F.expr("cast(map() as map<string,bigint>)"),
            ).alias("redactions_by_type"),
            F.lit(completed_ts).cast("timestamp").alias("completed_ts"),
        )
    )
