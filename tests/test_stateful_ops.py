"""Custom stateful/grouped operators: streaming exact dedup
(applyInPandasWithState) and host boilerplate strip (applyInPandas)."""

from incident_pii_redactor_spark.operators.boilerplate import host_boilerplate_strip
from incident_pii_redactor_spark.streaming.dedup_stream import streaming_exact_dedup
from incident_pii_redactor_spark.streaming.scrub_stream import read_pages_stream


def test_streaming_exact_dedup(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt
    import pandas as pd

    d = tmp_path / "in"
    d.mkdir()
    ts = dt.datetime(2025, 1, 1)
    mk = lambda rows: pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    # batch 1: two distinct texts (one duplicated); batch 2: re-fetch + new
    pq.write_table(mk([
        ("https://a/1", ts, b"", "alpha beta gamma", "en"),
        ("https://a/2", ts, b"", "alpha beta gamma", "en"),
        ("https://a/3", ts, b"", "delta epsilon", "en"),
    ]), str(d / "b1.parquet"))
    pq.write_table(mk([
        ("https://a/4", ts, b"", "alpha  beta   gamma", "en"),  # ws-normalized dup
        ("https://a/5", ts, b"", "zeta eta theta", "en"),
    ]), str(d / "b2.parquet"))

    pages = read_pages_stream(spark, str(d), max_files_per_trigger=1)
    deduped = streaming_exact_dedup(pages)
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    assert not q.isActive  # availableNow must TERMINATE (timer-bug guard)
    got = {r.url: r.text for r in spark.sql("select * from dedup_out").collect()}
    # first-seen per fingerprint only: /1 (not /2, /4), /3, /5
    assert set(got) == {"https://a/1", "https://a/3", "https://a/5"}


def test_host_boilerplate_strip(spark):
    footer = "subscribe to our newsletter | cookie policy"
    rows = []
    for i in range(10):
        rows.append((f"https://big.example.com/p{i}",
                     f"unique content number {i}\n{footer}"))
    rows.append(("https://small.example.com/p0", f"tiny site\n{footer}"))
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r.url: r for r in host_boilerplate_strip(df, min_pages=5).collect()}

    big = out["https://big.example.com/p3"]
    assert footer not in big.text_clean
    assert "unique content number 3" in big.text_clean
    assert big.n_lines_removed == 1
    # small host: insufficient evidence -> untouched
    small = out["https://small.example.com/p0"]
    assert footer in small.text_clean and small.n_lines_removed == 0


def test_scrub_spans_table(spark):
    from incident_pii_redactor_spark.operators.spans_table import scrub_spans

    df = spark.createDataFrame(
        [("u1", "Mail alice.j@corp1.com or call +1-555-123-4567. "
                "Also see support@example.com.")],
        "url string, text string")
    spans = scrub_spans(df).collect()
    by_type = {s.entity_type: s for s in spans}
    assert by_type["email"].action == "REDACT"
    assert by_type["email"].matched_text == "alice.j@corp1.com"
    assert by_type["phone"].replacement == "[REDACTED_PHONE]"
    assert "Mail" in by_type["email"].context
    # offsets point into the original text
    for s in spans:
        assert df.collect()[0].text[s.start:s.end] == s.matched_text


def test_pseudonym_consistency_cross_doc(spark):
    """A10 cross-doc variant: same (entity_type, matched_text) must map to
    exactly one replacement across ALL documents — groupBy + countDistinct
    over the spans table."""
    from pyspark.sql import functions as F

    from incident_pii_redactor_spark.operators.spans_table import scrub_spans

    df = spark.createDataFrame(
        [("u1", "John Smith logged in from 10.0.0.7 yesterday."),
         ("u2", "Later John Smith connected again via 10.0.0.7 and left."),
         ("u3", "An unrelated Mary Jones used 10.9.9.9 all day today.")],
        "url string, text string")
    bad = (
        scrub_spans(df)
        .filter(F.col("action") != "RETAIN")
        .groupBy("entity_type", "matched_text")
        .agg(F.countDistinct("replacement").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert bad.count() == 0


def test_streaming_canonical_url_dedup(spark, tmp_path):
    """key_expr turns the stateful dedup into cross-snapshot URL dedup:
    re-fetches of the same canonical URL (tracking params, fragments,
    host case) are suppressed across microbatches even when their TEXT
    differs (snapshot drift)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from incident_pii_redactor_spark.functions.text import canonical_url

    d = tmp_path / "in"
    d.mkdir()
    ts = dt.datetime(2025, 1, 1)
    mk = lambda rows: pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(mk([
        ("https://News.example/story/1?utm_source=rss", ts, b"", "v1 text", "en"),
        ("https://news.example/other/2", ts, b"", "other page", "en"),
    ]), str(d / "b1.parquet"))
    pq.write_table(mk([
        # same canonical URL as /story/1, later snapshot, different text
        ("HTTPS://news.example/story/1#frag", ts, b"", "v2 text drifted", "en"),
        ("https://news.example/fresh/3", ts, b"", "fresh page", "en"),
    ]), str(d / "b2.parquet"))

    pages = read_pages_stream(spark, str(d), max_files_per_trigger=1)
    deduped = streaming_exact_dedup(pages, key_expr=canonical_url("url"))
    q = (
        deduped.writeStream.format("memory").queryName("urldedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    got = sorted(r.url for r in spark.sql(
        "select * from urldedup_out").collect())
    assert got == [
        "https://News.example/story/1?utm_source=rss",
        "https://news.example/fresh/3",
        "https://news.example/other/2",
    ]
