"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Scores every document by the mean hashed-unigram log-likelihood ratio
between a TARGET distribution (a curated / in-domain subset) and the RAW
corpus; resampling by these weights biases a 100-TB crawl toward the
target domain. This is the standard pretraining-data selection operator
(used for e.g. domain-matching The Pile subsets).

Spark-first shape:

* Both LMs live in a BOUNDED ``n_buckets`` hashed feature space
  (default 2**18), so the fused model — raw counts LEFT JOIN target
  counts per bucket, corpus totals attached via an unpartitioned window
  over the BUCKET table (<= n_buckets rows on one task by construction,
  never the corpus) — is one broadcast-sized table produced by
  map-side-combined groupBys.
* The corpus then streams through ONE broadcast hash join and a per-doc
  partial-sum groupBy; the only corpus shuffle carries
  ``(doc_id, partial sums)``. No cross join, no driver action.
* Add-one smoothing over the bucket space; ``ROUND(mean, 6)`` on the
  final weight per the repo float-sum policy (per-doc summation order
  is engine- and run-dependent).

DuckDB oracle twin: ``__spark_entry__.oracle_sql()['doc_dsir_weights']``
(same md5 bucket recipe, same smoothing, LN both sides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from incident_pii_redactor_spark.functions.dedup import md5_int
from incident_pii_redactor_spark.functions.text import words

N_BUCKETS = 1 << 18


def dsir_model(toks: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, c_r, t_r, c_t, t_t) — the fused raw+target LM table.
    Bounded by n_buckets rows; every count column is non-null (c_t = 0
    for buckets the target never emits, t_t = 0 if the target is empty)."""
    w_all = Window.partitionBy()  # bounded: <= n_buckets rows
    raw = (
        toks.groupBy("bucket").agg(F.count("*").alias("c_r"))
        .withColumn("t_r", F.sum("c_r").over(w_all))
    )
    tgt = toks.filter("_tgt").groupBy("bucket").agg(F.count("*").alias("c_t"))
    return (
        raw.join(tgt, "bucket", "left")
        .withColumn("c_t", F.coalesce(F.col("c_t"), F.lit(0)))
        .withColumn("t_t", F.coalesce(F.sum("c_t").over(w_all), F.lit(0)))
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id_col, n_tokens bigint, dsir_weight double) for every doc with
    at least one token. ``is_target`` marks the rows whose token
    distribution defines the target LM (they stay in the raw LM too —
    DSIR's raw side is the full corpus)."""
    # Two-step select so ``is_target`` is evaluated once per doc BELOW
    # the Generate and rides through as a column — a single
    # select(expr, explode(...)) puts the expr Project above the
    # Generate, re-evaluating it per token (same fix as
    # classifier.train_nb_weights; measured 13x there).
    from incident_pii_redactor_spark.plans.session import (
        scan_parallelism_floor)

    toks = (
        scan_parallelism_floor(
            df.select(F.col(id_col), is_target.alias("_tgt"),
                      F.col(text_col)))
        .select(id_col, "_tgt",
                F.explode(words(F.lower(F.col(text_col)))).alias("tok"))
        .select(id_col, "_tgt", md5_int(F.col("tok"), n_buckets).alias("bucket"))
    )
    model = dsir_model(toks, n_buckets)
    dD = F.lit(float(n_buckets))
    llr = (
        F.log((F.col("c_t") + 1) / (F.col("t_t") + dD))
        - F.log((F.col("c_r") + 1) / (F.col("t_r") + dD))
    )
    return (
        toks.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(llr) / F.count("*"), 6).alias("dsir_weight"),
        )
    )
