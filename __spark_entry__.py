"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship fused quality-filter + PII-scrub pipeline on
the sf0.001 ``documents`` table. ``queries()`` / ``oracle_sql()`` — one
entry per implemented operator family (SURVEY.md §2), DuckDB-checked
where SQL-expressible; genuinely non-SQL ops (the full arbitrated scrub,
langid/perplexity models, LSH-ANN bucketing) are rows-only by design.

Result-type policy for the value-hash compare (round-2 hardening — see
tools/check_correctness.py docstring for the evidence): every
driver-facing column is string / bigint / double / boolean / timestamp
on BOTH engines. Money aggregates still go through DECIMAL(18,2)
internally (exact, associative), but the FINAL value is
``CAST(<exact decimal> AS DOUBLE)`` on both sides — the two engines
convert the same exact decimal to the same IEEE double, bit for bit,
while Decimal/HUGEINT/int32 outputs render differently through the
driver's float-coercing hash path (trailing zeros: ``'9725234.1570'``
vs ``'9725234.157'``). Doubles computed from identical inputs carry no
extra ROUND (two engines rounding the same double can disagree at
shortest-repr midpoints); ROUND(…, 6) is kept only where the two
engines sum floats in different orders. LIMIT / grouped queries carry a
total ORDER BY with a unique tie-break on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused langid -> perplexity -> heuristics -> keep/drop ->
    arbitrated PII scrub, one mapInPandas stage (SURVEY.md §7 step 3)."""
    return _scrub_documents(spark, SF_SMOKE)


def _scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from incident_pii_redactor_spark.operators.scrub import quality_scrub
    from incident_pii_redactor_spark.quality.scorer import DRIVER_DOCS

    docs = _t(spark, sf_dir, "documents")
    out = quality_scrub(docs, id_cols=("doc_id",), cfg=DRIVER_DOCS)
    # raw ppl double (no ROUND: the golden fixture stores the identical
    # bits from the shared pure-Python core; rounding could diverge);
    # int32 counters cast to bigint per the result-type policy
    return out.select(
        "doc_id", "lang_pred", "ppl",
        "word_count", "keep", "drop_reason", "text_scrubbed",
        F.col("n_redactions").cast("bigint").alias("n_redactions"),
        F.col("residual_pii").cast("bigint").alias("residual_pii"),
        "quality_score",
    )


# ---------------------------------------------------------------------------
# relational operator coverage (joins / windows / rollup / semi / anti / agg)
# ---------------------------------------------------------------------------

def _q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums, final cast to double (identical bits
            # both engines; Decimal output would be hash-hostile)
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # product stays at scale 4 — casting it down to scale 2 hits
            # exact .xx50 midpoints where engines' rounding modes differ
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            # double/bigint division of identical inputs — no ROUND needed
            (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
            .alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q5_nation_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _top_orders_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk",
                F.col("o_totalprice").alias("totalprice"))
        .orderBy("o_custkey", "rnk")
    )


def _orders_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total"),
        )
        .orderBy(F.asc_nulls_first("o_orderstatus"),
                 F.asc_nulls_first("o_orderpriority"))
    )


def _orders_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg(F.col("o_totalprice").cast("double")), 6)
            .alias("avg_price"),
        )
        .orderBy(F.asc_nulls_first("o_orderstatus"),
                 F.asc_nulls_first("o_orderpriority"))
    )


def _customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def _big_spender_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def _events_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
        .orderBy("hour")
    )


def _user_sessions(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic keeps exact microsecond precision on both engines
    # (unix_timestamp() truncates to whole seconds and would disagree with
    # DuckDB's fractional epoch() for gaps inside [1800s, 1801s))
    gap = F.col("ts") - F.lag("ts").over(w)
    is_break = gap > F.expr("INTERVAL 30 MINUTES")
    return (
        e.withColumn("brk", is_break)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("brk"), 1).otherwise(0)).alias("n_breaks"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def _q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: tight filter + single aggregate (pushdown showcase)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(dec("l_extendedprice") * dec("l_discount"))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
    )


def _q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        # null-when-not-promo: SUM skips nulls identically in both engines
        F.sum(F.when(F.col("p_type") == "PROMO", rev))
        .cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


def _q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a grouped join, then top-k."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate",
                F.col("total_qty").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


def _late_shipments_by_priority(spark, sf_dir):
    """Q12 shape: CASE-bucketed counts over a join (ship lag > 90 days)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
            F.count("*").alias("total_lines"),
        )
        .orderBy("o_orderpriority")
    )


def _custkeys_intersect(spark, sf_dir):
    """Set op: customers that are also order placers (INTERSECT)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o).orderBy("k")


def _parts_never_ordered(spark, sf_dir):
    """Set op: EXCEPT — part keys with no lineitem."""
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    return p.exceptAll(li.distinct())


def _doc_word_freq(spark, sf_dir):
    """Explode (UDTF-shaped flatMap) + top-k with total tie-break."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# text / quality / dedup / fingerprint over `documents`
# ---------------------------------------------------------------------------

def _doc_token_stats(spark, sf_dir):
    from incident_pii_redactor_spark.functions.text import (
        mean_word_len,
        token_count_bpe_ish,
        word_count,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count("text").cast("bigint").alias("n_words"),
        F.round(mean_word_len("text"), 6).alias("mean_word_len"),
        token_count_bpe_ish("text").cast("bigint").alias("n_tokens"),
    )


def _doc_lang_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def _doc_quality_prefilter(spark, sf_dir):
    from incident_pii_redactor_spark.functions.text import (
        quality_prefilter,
        stopword_ratio,
        symbol_ratio,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        quality_prefilter("text", min_words=20).alias("keep"),
        F.round(stopword_ratio("text"), 6).alias("stop_ratio"),
        F.round(symbol_ratio("text"), 6).alias("sym_ratio"),
    )


def _doc_fingerprints(spark, sf_dir):
    from incident_pii_redactor_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


def _doc_exact_dup_groups(spark, sf_dir):
    from incident_pii_redactor_spark.functions.dedup import exact_dedup_stats

    return exact_dedup_stats(_t(spark, sf_dir, "documents"))


def _doc_minhash_signatures(spark, sf_dir):
    from incident_pii_redactor_spark.functions.dedup import minhash_signature

    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature("text", n=3, n_perm=4)
    return d.select(
        "doc_id",
        F.array_join(F.transform(sig, lambda v: v.cast("string")), "|").alias("sig"),
    )


def _doc_minhash_pairs(spark, sf_dir):
    from incident_pii_redactor_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n=3, n_perm=8, bands=4
    ).orderBy("id_a", "id_b")


def _doc_simhash(spark, sf_dir):
    from incident_pii_redactor_spark.functions.dedup import simhash64

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash64("text").alias("simhash"))


def _doc_redact_emails(spark, sf_dir):
    from incident_pii_redactor_spark.functions.text import redact_emails

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", redact_emails("text").alias("text_redacted"))


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------

def _emb_norms(spark, sf_dir):
    from incident_pii_redactor_spark.functions.similarity import embedding_norms

    return embedding_norms(_t(spark, sf_dir, "embeddings"))


def _emb_cosine_topk(spark, sf_dir):
    from incident_pii_redactor_spark.functions.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(e.filter(F.col("vec_id") != 0), list(qv), k=10)


def _emb_lsh_ann(spark, sf_dir):
    from incident_pii_redactor_spark.functions.similarity import lsh_ann_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_ann_topk(e.filter(F.col("vec_id") != 0), list(qv), k=10)


def _doc_repetition_stats(spark, sf_dir):
    """Gopher repetition signals, JVM-side (SQL-checkable subset of the
    quality rules: duplicate-line fraction + distinct-word ratio)."""
    d = _t(spark, sf_dir, "documents")
    lines = F.filter(
        F.transform(F.split("text", "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    words = F.filter(F.split("text", " "), lambda w: w != "")
    dup_line_frac = F.when(
        F.size(lines) > 1,
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(F.lit(0.0))
    distinct_word_ratio = F.when(
        F.size(words) > 0,
        F.size(F.array_distinct(words)) / F.size(words),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(distinct_word_ratio, 6).alias("distinct_word_ratio"),
    )


def _doc_toxicity(spark, sf_dir):
    """Block-list toxicity ratio, JVM-side (functions mirror of
    quality.toxicity for SQL-expressible corpus scans)."""
    from incident_pii_redactor_spark.quality.toxicity import BLOCK_WORDS

    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    block = F.array(*[F.lit(w) for w in sorted(BLOCK_WORDS)])
    n_bad = F.size(F.filter(words, lambda w: F.array_contains(block, w)))
    return d.select(
        "doc_id",
        n_bad.cast("bigint").alias("n_toxic"),
        F.round(
            F.when(F.size(words) > 0, n_bad / F.size(words)).otherwise(0.0), 6
        ).alias("tox_ratio"),
    )


def _emb_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (dedup family): exact pairwise at
    oracle scale; the LSH-bucketed scale path is emb_lsh_ann."""
    from incident_pii_redactor_spark.functions.similarity import cosine

    e = _t(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.30)
        .orderBy("id_a", "id_b")
    )


def _emb_label_centroids(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(
                F.avg(F.element_at(F.col("embedding"), 1).cast("double")), 6
            ).alias("avg_dim0"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "q5_nation_revenue": _q5_nation_revenue,
        "q6_forecast_revenue": _q6_forecast_revenue,
        "q14_promo_share": _q14_promo_share,
        "q18_large_orders": _q18_large_orders,
        "late_shipments_by_priority": _late_shipments_by_priority,
        "top_orders_per_customer": _top_orders_per_customer,
        "orders_rollup": _orders_rollup,
        "orders_cube": _orders_cube,
        "customers_without_orders": _customers_without_orders,
        "big_spender_customers": _big_spender_customers,
        "events_hourly": _events_hourly,
        "user_sessions": _user_sessions,
        "custkeys_intersect": _custkeys_intersect,
        "parts_never_ordered": _parts_never_ordered,
        "doc_word_freq": _doc_word_freq,
        "doc_token_stats": _doc_token_stats,
        "doc_lang_stats": _doc_lang_stats,
        "doc_quality_prefilter": _doc_quality_prefilter,
        "doc_fingerprints": _doc_fingerprints,
        "doc_exact_dup_groups": _doc_exact_dup_groups,
        "doc_minhash_signatures": _doc_minhash_signatures,
        "doc_minhash_pairs": _doc_minhash_pairs,
        "doc_simhash": _doc_simhash,
        "doc_redact_emails": _doc_redact_emails,
        "doc_repetition_stats": _doc_repetition_stats,
        "doc_toxicity": _doc_toxicity,
        "emb_near_dup_pairs": _emb_near_dup_pairs,
        "emb_norms": _emb_norms,
        "emb_cosine_topk": _emb_cosine_topk,
        "emb_lsh_ann": _emb_lsh_ann,
        "emb_label_centroids": _emb_label_centroids,
        "scrub_documents": _scrub_documents,
    }


_WORDS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_DEC = "CAST({} AS DECIMAL(18,2))"


def _toxicity_oracle_sql() -> str:
    from incident_pii_redactor_spark.quality.toxicity import BLOCK_WORDS

    block = ", ".join(f"'{w}'" for w in sorted(BLOCK_WORDS))
    return f"""
        SELECT doc_id,
               len(list_filter({_WORDS.replace('text', 'lower(text)')},
                   w -> w IN ({block}))) AS n_toxic,
               ROUND(CASE WHEN len({_WORDS}) > 0 THEN
                   CAST(len(list_filter({_WORDS.replace('text', 'lower(text)')},
                       w -> w IN ({block}))) AS DOUBLE) / len({_WORDS})
                   ELSE 0.0 END, 6) AS tox_ratio
        FROM documents
    """


def _minhash_oracle_sql(n_perm: int, mode: str) -> str:
    """DuckDB twin of functions.dedup.minhash_signature: one md5-derived
    30-bit base hash per 3-word shingle, n_perm universal-hash minima
    (A*h+B mod P) — exact integer parity with the Spark expression."""
    from incident_pii_redactor_spark.functions.dedup import _MH_M, _MH_P, _mh_params

    A, B = _mh_params(n_perm)
    perm_exprs = ", ".join(
        f"coalesce(list_min(list_transform(H, h -> ({a} * h + {b}) % {_MH_P})), {_MH_P})"
        for a, b in zip(A, B)
    )
    base = f"""
      WITH hashes AS (
        SELECT doc_id, list_transform(
          [array_to_string(w[i:i+2], ' ')
           for i in range(1, greatest(len(w) - 2, 0) + 1)],
          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {_MH_M}) AS H
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ), sig AS (SELECT doc_id, [{perm_exprs}] AS s FROM hashes)
    """
    if mode == "signatures":
        return base + """
            SELECT doc_id, array_to_string(
                list_transform(s, v -> CAST(v AS VARCHAR)), '|') AS sig
            FROM sig
        """
    return base + f"""
        , banded AS (
            SELECT doc_id, b AS band_id, array_to_string(
                list_transform(s[b*2+1:b*2+2], v -> CAST(v AS VARCHAR)), '|')
                AS band_key
            FROM sig, (SELECT unnest(range(0, 4)) AS b)
            WHERE s[1] <> {_MH_P}  -- unshingleable docs never enter LSH
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """


def oracle_sql() -> dict[str, str]:
    """DuckDB twins. Omitted on purpose (rows-only check): scrub_documents
    (full arbitrated scrub — 5-stage span pipeline, not SQL-expressible)
    and emb_lsh_ann (model-hash bucketing)."""
    rev = "(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"
    return {
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM({rev}) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": f"""
            SELECT l_orderkey, o_orderdate, CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15'
              AND l_shipdate > TIMESTAMP '1998-03-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "q5_nation_revenue": f"""
            SELECT n_name, CAST(SUM({rev}) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                 JOIN nation ON s_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name ORDER BY revenue DESC, n_name ASC
        """,
        "q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q14_promo_share": f"""
            SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {rev} END)
                       AS DOUBLE) AS promo_revenue,
                   CAST(SUM({rev}) AS DOUBLE) AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "q18_large_orders": """
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CAST(total_qty AS DOUBLE) AS total_qty
            FROM (SELECT l_orderkey,
                         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) big
            JOIN orders ON big.l_orderkey = o_orderkey
            ORDER BY CAST(total_qty AS DOUBLE) DESC, o_orderkey ASC LIMIT 20
        """,
        "late_shipments_by_priority": """
            SELECT o_orderpriority,
                   CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
                   COUNT(*) AS total_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, rnk, o_totalprice AS totalprice
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                  FROM orders)
            WHERE rnk <= 3
            ORDER BY o_custkey, rnk
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST,
                     o_orderpriority ASC NULLS FIRST
        """,
        "orders_cube": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                   ROUND(AVG(CAST(o_totalprice AS DOUBLE)), 6) AS avg_price
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST,
                     o_orderpriority ASC NULLS FIRST
        """,
        "customers_without_orders": """
            -- NOT EXISTS (not NOT IN): null-tolerant, matching Spark's
            -- left_anti join semantics under NULL o_custkey (ADVICE.md)
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "big_spender_customers": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)
            ORDER BY c_custkey
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sum_value
            FROM events GROUP BY 1
            ORDER BY hour
        """,
        "user_sessions": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN gap > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks,
                   COUNT(*) AS n_events
            FROM (SELECT user_id, ts - lag(ts) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) AS gap
                  FROM events)
            GROUP BY user_id
            ORDER BY user_id
        """,
        "custkeys_intersect": """
            SELECT k FROM (
                SELECT c_custkey AS k FROM customer
                INTERSECT SELECT o_custkey AS k FROM orders
            ) ORDER BY k
        """,
        "parts_never_ordered": """
            SELECT p_partkey AS k FROM part
            EXCEPT ALL SELECT DISTINCT l_partkey AS k FROM lineitem
        """,
        "doc_word_freq": """
            SELECT word, COUNT(*) AS n
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY word ORDER BY n DESC, word ASC LIMIT 20
        """,
        "doc_token_stats": f"""
            SELECT doc_id, len({_WORDS}) AS n_words,
                   ROUND(CASE WHEN len({_WORDS}) > 0 THEN
                       CAST(list_sum(list_transform({_WORDS}, w -> len(w))) AS DOUBLE)
                       / len({_WORDS}) ELSE 0.0 END, 6) AS mean_word_len,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
            FROM documents
        """,
        "doc_lang_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
            FROM documents GROUP BY lang
            ORDER BY lang
        """,
        "doc_quality_prefilter": f"""
            SELECT doc_id,
                   (nw >= 20 AND nw <= 100000 AND sym <= 0.1) AS keep,
                   ROUND(stp, 6) AS stop_ratio, ROUND(sym, 6) AS sym_ratio
            FROM (
              SELECT doc_id, len({_WORDS}) AS nw,
                CASE WHEN len({_WORDS}) > 0 THEN
                  (CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
                   + CAST(len(text) - len(replace(text, '...', '')) AS DOUBLE) / 3)
                  / len({_WORDS}) ELSE 0.0 END AS sym,
                CASE WHEN len({_WORDS}) > 0 THEN
                  CAST(len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                    w -> w IN ('the','be','to','of','and','a','in','that','have','i','it','for','not','on','with','he','as','you','do','at','this','but','his','by','from','they','we','say','her','she','or')))
                    AS DOUBLE) / len({_WORDS}) ELSE 0.0 END AS stp
              FROM documents)
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "doc_exact_dup_groups": """
            SELECT md5(text) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_id
            FROM documents GROUP BY 1 HAVING COUNT(*) > 1
        """,
        "doc_minhash_signatures": _minhash_oracle_sql(n_perm=4, mode="signatures"),
        "doc_minhash_pairs": _minhash_oracle_sql(n_perm=8, mode="pairs"),
        "doc_simhash": """
            SELECT doc_id,
              CAST(CASE WHEN len(h) > 0 THEN (
                SELECT SUM(CASE WHEN 2 * len(list_filter(h, v -> (v >> b) & 1 = 1))
                                    >= len(h)
                           THEN (1::BIGINT << b) ELSE 0 END)
                FROM (SELECT unnest(range(0, 60)) AS b)
              ) ELSE 0 END AS BIGINT) AS simhash
            FROM (SELECT doc_id,
                    list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                        x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h
                  FROM documents)
        """,
        "doc_redact_emails": """
            SELECT doc_id, regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                '[REDACTED_EMAIL]', 'g') AS text_redacted
            FROM documents
        """,
        "doc_repetition_stats": f"""
            SELECT doc_id,
                   ROUND(CASE WHEN len(lines) > 1 THEN
                       1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                       ELSE 0.0 END, 6) AS dup_line_frac,
                   ROUND(CASE WHEN len(w) > 0 THEN
                       CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                       ELSE 0.0 END, 6) AS distinct_word_ratio
            FROM (SELECT doc_id,
                    list_filter(list_transform(string_split(text, chr(10)),
                        x -> trim(x)), x -> x <> '') AS lines,
                    {_WORDS} AS w
                  FROM documents)
        """,
        "doc_toxicity": _toxicity_oracle_sql(),
        "emb_near_dup_pairs": """
            SELECT id_a, id_b, cos_sim FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                         6) AS cos_sim
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ) WHERE cos_sim >= 0.30
            ORDER BY id_a, id_b
        """,
        "emb_norms": """
            SELECT vec_id, ROUND(sqrt(list_dot_product(
                embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
            FROM embeddings
        """,
        "emb_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(list_dot_product(embedding::DOUBLE[], qv::DOUBLE[]) /
                       (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))), 6)
                       AS cos_sim
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
        """,
        "emb_label_centroids": """
            SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
                   ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS avg_dim0
            FROM embeddings GROUP BY label
            ORDER BY label
        """,
    }
