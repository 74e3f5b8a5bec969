"""fastText-style linear quality classifier over hashed token features.

The reference repo scores documents only through per-span LLM judging
(`llm_verifier.py`); web-scale corpora (C4, RefinedWeb, FineWeb) instead
run a supervised linear classifier — fastText with the hashing trick —
over every page. This module implements that scoring pattern Spark-first:

* The MODEL IS A TABLE ``(bucket bigint, w decimal(6,2))``: token ->
  ``md5_int(token, N_BUCKETS)`` (the engine-wide portable hash recipe,
  `functions/dedup.py:md5_int`) -> weight lookup. A real fastText model
  has ~2**20 hashed n-gram buckets — a few MB — so the whole model
  BROADCASTS and scoring never shuffles the corpus: the only exchange is
  the per-doc partial-sum ``groupBy(doc_id)`` (map-side combined, a few
  bytes per doc).
* Weights are DECIMAL multiples of 0.25 and are summed exactly
  (decimal aggregation is order-insensitive), then cast to double once
  at the end — the repo-wide result-type policy, so the DuckDB oracle
  twin is hash-identical with zero tolerance.
* The demo vocabulary below is tiny; swapping in a trained model is a
  one-line change (load the (bucket, w) parquet instead of
  ``weights_df``). Hash collisions fold colliding tokens onto the same
  weight — the standard hashing-trick trade, identical in both engines
  because both use the same md5 recipe.

Scale notes (100 TB): corpus-side work is one narrow projection
(tokenize -> hash) + one broadcast hash join + one partial-aggregated
groupBy on doc_id. No skew risk (doc_id is unique), no wide rows on the
shuffle (sum + count only).
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from incident_pii_redactor_spark.functions.dedup import md5_int
from incident_pii_redactor_spark.functions.text import words

# 2**20 hashed feature buckets — fastText's default bucket count.
N_BUCKETS = 1 << 20

# Demo model: (token, weight). Weights are exact binary fractions
# (multiples of 0.25) so decimal<->double conversion is lossless in both
# engines. Positive = prose/structure signal, negative = junk signal.
# Terms beyond the synthetic corpus ('free', 'click', ...) document the
# intended real-world shape.
VOCAB: tuple[tuple[str, str], ...] = (
    ("data", "1.00"),
    ("query", "0.75"),
    ("table", "0.50"),
    ("join", "0.75"),
    ("stream", "0.50"),
    ("window", "0.50"),
    ("merge", "0.25"),
    ("sort", "0.25"),
    ("spark", "1.25"),
    ("batch", "0.25"),
    ("slow", "-0.75"),
    ("dup", "-1.00"),
    ("small", "-0.25"),
    ("the", "-0.25"),
    ("a", "-0.50"),
    # junk markers absent from the synthetic corpus, present in real webtext
    ("free", "-2.00"),
    ("click", "-1.75"),
    ("subscribe", "-1.50"),
    ("winner", "-2.00"),
    ("casino", "-2.50"),
)


def bucket_of(term: str) -> int:
    """Python twin of ``md5_int``: first 15 md5 hex chars as int, mod
    N_BUCKETS. Byte-identical to the Spark and DuckDB expressions."""
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % N_BUCKETS


def weight_rows() -> list[tuple[int, Decimal]]:
    """(bucket, weight) rows; collisions within the vocab sum (none in
    the demo vocab, but the contract must hold for a 2**20-bucket model)."""
    acc: dict[int, Decimal] = {}
    for term, w in VOCAB:
        b = bucket_of(term)
        acc[b] = acc.get(b, Decimal("0")) + Decimal(w)
    return sorted(acc.items())


def weights_df(spark: SparkSession) -> DataFrame:
    """The model as a DataFrame — broadcast-sized by construction."""
    rows = [(b, str(w)) for b, w in weight_rows()]
    return spark.createDataFrame(rows, "bucket bigint, w_str string").select(
        "bucket", F.col("w_str").cast("decimal(6,2)").alias("w")
    )


def classify_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns (id_col, word_count bigint, score double, keep boolean) where
    score = sum(weight of each token's bucket) / word_count and
    keep = score > 0. Empty docs score 0.0 and keep=false.
    """
    from incident_pii_redactor_spark.plans.session import (
        scan_parallelism_floor)

    spark = df.sparkSession
    wdf = model if model is not None else weights_df(spark)

    # parallelism floor (no-op at scale) before the tokenize fan-out —
    # a one-row-group source otherwise runs it in a single task
    narrow = scan_parallelism_floor(df.select(id_col, text_col))
    toks = narrow.select(
        F.col(id_col),
        F.explode(words(F.lower(F.col(text_col)))).alias("tok"),
    )
    hits = (
        toks.select(id_col, md5_int(F.col("tok"), N_BUCKETS).alias("bucket"))
        .join(F.broadcast(wdf), "bucket", "inner")
        .groupBy(id_col)
        .agg(F.sum("w").alias("sw"))
    )
    base = narrow.select(
        F.col(id_col),
        F.size(words(F.lower(F.col(text_col)))).cast("bigint").alias("word_count"),
    )
    score = F.when(
        F.col("word_count") > 0,
        F.coalesce(F.col("sw"), F.lit(0)).cast("double") / F.col("word_count"),
    ).otherwise(F.lit(0.0))
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "word_count",
            score.alias("score"),
            (score > 0).alias("keep"),
        )
    )


def weights_values_sql() -> str:
    """DuckDB VALUES list for the oracle twin — same buckets, same
    decimals, generated from the same ``weight_rows()``."""
    return ", ".join(
        f"({b}, CAST({w} AS DECIMAL(6,2)))" for b, w in weight_rows()
    )


# ---------------------------------------------------------------------------
# In-engine distillation: multinomial Naive Bayes from integer counts
# ---------------------------------------------------------------------------

def train_nb_weights(
    df: DataFrame,
    is_positive: Column,
    text_col: str = "text",
    n_buckets: int = 1 << 18,
) -> DataFrame:
    """Train a multinomial-NB token classifier IN the engine — the
    distillation step FineWeb-Edu/DCLM run offline (label a corpus with
    an expensive judge, fit a fast linear model on hashed tokens, score
    everything with the cheap model). Here the weights are per-bucket
    log-odds ``LN((c_pos+1)/(t_pos+D)) - LN((c_neg+1)/(t_neg+D))`` from
    INTEGER counts only, so training is exactly reproducible (no SGD,
    no float accumulation order); same fused-model shape as
    ``quality/dsir.py`` (NB contrasts pos vs neg where DSIR contrasts
    target vs raw).

    Returns (bucket, c_pos, c_neg, w) — bounded by ``n_buckets`` rows,
    broadcast-sized by construction. Corpus totals ride in via an
    unpartitioned window over the BUCKET table, never the corpus.
    """
    from incident_pii_redactor_spark.functions.dedup import md5_int

    # Two-step select: the label must be evaluated BELOW the Generate
    # (once per doc) and ride through as a pass-through column. A single
    # select(label, explode(...)) plans the label Project ON TOP of the
    # Generate — the full-text word_count/symbol_ratio regexes then run
    # once per TOKEN (~54x redundant work; measured 5.9 s -> 0.45 s on
    # the sf0.1 corpus, guide §1/§2.3 "project before the fan-out").
    from incident_pii_redactor_spark.plans.session import (
        scan_parallelism_floor)

    toks = (
        scan_parallelism_floor(
            df.select(is_positive.alias("_pos"), F.col(text_col)))
        .select("_pos", F.explode(words_lower(text_col)).alias("tok"))
        .select("_pos", md5_int(F.col("tok"), n_buckets).alias("bucket"))
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()  # bounded: <= n_buckets rows
    cnt = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(~F.col("_pos"), 1).otherwise(0)).alias("c_neg"),
    )
    dD = F.lit(float(n_buckets))
    return (
        cnt.withColumn("t_pos", F.sum("c_pos").over(w_all))
        .withColumn("t_neg", F.sum("c_neg").over(w_all))
        .select(
            "bucket", "c_pos", "c_neg",
            (F.log((F.col("c_pos") + 1) / (F.col("t_pos") + dD))
             - F.log((F.col("c_neg") + 1) / (F.col("t_neg") + dD))).alias("w"),
        )
    )


def classify_nb(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
) -> DataFrame:
    """Score docs with a trained NB weight table: mean per-token
    log-odds (ROUND 6 per the repo float-sum policy), keep iff > 0.
    One broadcast join + one per-doc partial-sum groupBy; docs with
    zero tokens are absent (they have no token evidence)."""
    from incident_pii_redactor_spark.functions.dedup import md5_int

    from incident_pii_redactor_spark.plans.session import (
        scan_parallelism_floor)

    toks = (
        scan_parallelism_floor(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(words_lower(text_col)).alias("tok"))
        .select(id_col, md5_int(F.col("tok"), n_buckets).alias("bucket"))
    )
    return (
        toks.join(F.broadcast(weights.select("bucket", "w")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("w") / F.count("*"), 6).alias("nb_score"),
        )
        .withColumn("keep_distilled", F.col("nb_score") > 0)
    )


def words_lower(text_col: str) -> Column:
    return words(F.lower(F.col(text_col)))
