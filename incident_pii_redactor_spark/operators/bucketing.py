"""Bucketed-table output: co-located joins for downstream consumers.

A scrubbed corpus is re-joined constantly downstream (against quality
audits, embedding tables, dedup verdicts — always on ``url``). Writing
the output BUCKETED by the join key means every later equi-join on url
is exchange-free: Spark reads both sides pre-partitioned and zips
buckets, no shuffle of the 10^12-row table, ever again. This is the
"pre-partition once, reuse across stages" lever from the scale brief.

Bucket count guidance at 100 TB: pick buckets so one bucket ~ 1 GB
(=> ~100k buckets), and bucket BOTH tables of a recurring join with the
same count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  on: str = "url", how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — planner elides both exchanges
    (asserted by tests via the physical plan)."""
    return spark.table(left).join(spark.table(right), on=on, how=how)
