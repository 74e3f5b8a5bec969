"""WARC/WET ingestion (sources/warc.py): round-trip byte identity,
streaming bounds, corruption tolerance, and the Spark reader landing
the exact ``pages`` shape."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from incident_pii_redactor_spark.sources.pages import synth_pages
from incident_pii_redactor_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    records_to_page_rows,
    write_warc,
)


@pytest.fixture(scope="module")
def small_pages() -> pd.DataFrame:
    return synth_pages(40, seed=7)


def test_warc_roundtrip_gzip_and_plain_identical(tmp_path, small_pages):
    gz = str(tmp_path / "a.warc.gz")
    plain = str(tmp_path / "a.warc")
    write_warc(gz, small_pages, gzip_per_record=True)
    write_warc(plain, small_pages, gzip_per_record=False)
    rows_gz = list(records_to_page_rows(open(gz, "rb").read()))
    rows_plain = list(records_to_page_rows(open(plain, "rb").read()))
    assert len(rows_gz) == len(rows_plain) == len(small_pages)
    for got, exp in zip(rows_gz, small_pages.itertuples(index=False)):
        assert got["url"] == exp.url
        # the north rule's per-row invariant: byte-identical content
        assert got["html"] == bytes(exp.html)
        assert got["text"] is None
        assert got["warc_ts"] == pd.Timestamp(exp.warc_ts).floor("s")
    assert rows_gz == rows_plain


def test_wet_conversion_records_carry_text_and_lang(tmp_path, small_pages):
    wet = str(tmp_path / "a.warc.wet.gz")
    write_warc(wet, small_pages, wet=True)
    rows = list(records_to_page_rows(open(wet, "rb").read()))
    assert len(rows) == len(small_pages)
    for got, exp in zip(rows, small_pages.itertuples(index=False)):
        assert got["text"] == exp.text
        assert got["html"] is None
        assert got["lang"] == exp.lang


def test_non_page_record_types_skipped(tmp_path, small_pages):
    from incident_pii_redactor_spark.sources.warc import _warc_record

    info = _warc_record("warcinfo", "urn:x", "2025-01-01T00:00:00Z",
                        b"software: test\r\n")
    req = _warc_record("request", "https://x.example/", "2025-01-01T00:00:00Z",
                       b"GET / HTTP/1.1\r\n\r\n")
    page = str(tmp_path / "p.warc")
    write_warc(page, small_pages.head(3), gzip_per_record=False)
    data = info + req + open(page, "rb").read()
    rows = list(records_to_page_rows(data))
    assert [r["url"] for r in rows] == list(small_pages.head(3)["url"])


def test_truncated_file_keeps_earlier_records(tmp_path, small_pages):
    gz = str(tmp_path / "t.warc.gz")
    write_warc(gz, small_pages, gzip_per_record=True)
    data = open(gz, "rb").read()
    cut = data[: int(len(data) * 0.6)]
    rows = list(records_to_page_rows(cut))
    assert 0 < len(rows) < len(small_pages)
    full = list(records_to_page_rows(data))
    assert rows == full[: len(rows)]


def test_oversized_record_discarded_not_materialized(tmp_path, small_pages):
    """A record above max_record_bytes is skipped in bounded chunks;
    its neighbors on both sides still parse."""
    from incident_pii_redactor_spark.sources.warc import _warc_record

    big = _warc_record("response", "https://bomb.example/",
                       "2025-01-01T00:00:00Z",
                       b"HTTP/1.1 200 OK\r\n\r\n" + b"\x00" * 50_000)
    small = str(tmp_path / "s.warc")
    write_warc(small, small_pages.head(2), gzip_per_record=False)
    sdata = open(small, "rb").read()
    # sandwich: record0, bomb, record1
    recs = sdata.split(b"\r\nWARC/1.0\r\n")
    assert len(recs) == 2
    data = recs[0] + b"\r\n" + big + b"WARC/1.0\r\n" + recs[1]
    rows = list(records_to_page_rows(data, max_record_bytes=10_000))
    assert [r["url"] for r in rows] == list(small_pages.head(2)["url"])
    # and with a generous bound the bomb IS parsed (sanity on the splice)
    rows_all = list(records_to_page_rows(data))
    assert len(rows_all) == 3


def test_multi_member_gzip_streaming(tmp_path, small_pages):
    """The CC layout is one gzip member per record; a single-member file
    (whole stream gzipped at once) must also parse — gzip.GzipFile
    reads both transparently."""
    plain = str(tmp_path / "w.warc")
    write_warc(plain, small_pages.head(5), gzip_per_record=False)
    whole = gzip.compress(open(plain, "rb").read(), mtime=0)
    rows = list(records_to_page_rows(whole))
    assert len(rows) == 5


def test_read_warc_spark_lands_pages_shape(tmp_path, spark, small_pages):
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(str(d / "part-0.warc.gz"), small_pages.iloc[:20])
    write_warc(str(d / "part-1.warc.gz"), small_pages.iloc[20:])
    df = read_warc(spark, str(d / "*.warc.gz"), batch_rows=7)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    got = df.toPandas().sort_values("url").reset_index(drop=True)
    exp = small_pages.sort_values("url").reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got["url"]) == list(exp["url"])
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], exp["html"]))


def test_scrub_job_from_warc_equals_parquet_path(spark, tmp_path_factory):
    """End-to-end: the resumable scrub job ingesting raw WARC crawl
    files (--from-warc) produces byte-identical output to the same job
    over the equivalent pages parquet with --from-html (the synthetic
    html reproduces text exactly under extract_text)."""
    from jobs.scrub import parse_args, run

    from incident_pii_redactor_spark.sources.pages import synth_pages

    d = tmp_path_factory.mktemp("fromwarc")
    pages = synth_pages(300, seed=11)
    wdir = d / "warcs"
    wdir.mkdir()
    write_warc(str(wdir / "crawl-0.warc.gz"), pages.iloc[:150])
    write_warc(str(wdir / "crawl-1.warc.gz"), pages.iloc[150:])

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(pages, schema=schema, preserve_index=False),
        str(d / "pages.parquet"))

    def read_out(path):
        return (spark.read.parquet(path)
                .select("url", "keep", "text_scrubbed").toPandas()
                .set_index("url").sort_index())

    run(parse_args(
        ["--input", str(wdir / "*.warc.gz"), "--output", str(d / "out_w"),
         "--manifest", str(d / "mf_w"), "--n-buckets", "4",
         "--bucket-group-size", "4", "--from-warc"]), spark=spark)
    run(parse_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out_p"),
         "--manifest", str(d / "mf_p"), "--n-buckets", "4",
         "--bucket-group-size", "4", "--from-html"]), spark=spark)
    pd.testing.assert_frame_equal(read_out(str(d / "out_w")),
                                  read_out(str(d / "out_p")))


def test_read_warc_feeds_from_html_extraction(tmp_path, spark, small_pages):
    """WARC -> pages -> extract_text reproduces the original text column
    (the synthetic html is <html><body>{text}</body></html>), i.e. the
    crawl-ingestion edge composes with the existing --from-html path."""
    from pyspark.sql import functions as F

    from incident_pii_redactor_spark.functions.html import extract_text

    p = str(tmp_path / "x.warc.gz")
    write_warc(p, small_pages.head(10))
    df = read_warc(spark, p).withColumn("text", extract_text("html"))
    got = {r["url"]: r["text"] for r in df.select("url", "text").collect()}
    exp_df = spark.createDataFrame(
        small_pages.head(10)[["url", "html"]])
    exp = {r["url"]: r["text"] for r in exp_df.withColumn(
        "text", extract_text("html")).select("url", "text").collect()}
    assert got == exp
    assert all(v for v in got.values())


def test_negative_content_length_rejected(small_pages, tmp_path):
    """A crafted negative Content-Length must not turn the bounded read
    into read-to-EOF (review round 5)."""
    from incident_pii_redactor_spark.sources.warc import _warc_record

    good = _warc_record("response", "https://ok.example/",
                        "2025-01-01T00:00:00Z",
                        b"HTTP/1.1 200 OK\r\n\r\nfine")
    evil = good.replace(b"Content-Length: 23",
                        b"Content-Length: -1", 1)
    assert b"Content-Length: -1" in evil
    rows = list(records_to_page_rows(good + evil + good))
    # the first good record parses; the negative length ends the
    # stream (payload end unknowable) without yielding a bomb
    assert [r["url"] for r in rows] == ["https://ok.example/"]


def test_wet_null_lang_roundtrips_as_null(tmp_path):
    import pandas as pd

    pages = pd.DataFrame([{
        "url": "https://x.example/p", "warc_ts": pd.Timestamp("2025-01-01"),
        "html": b"", "text": "hello world", "lang": None}])
    p = str(tmp_path / "n.warc.wet.gz")
    write_warc(p, pages, wet=True)
    rows = list(records_to_page_rows(open(p, "rb").read()))
    assert rows[0]["lang"] is None  # not the string 'None'
