"""Structured Streaming wrapper: the same scrub operator over a file
stream, with watermarked windowed metrics (SURVEY.md §2.8 streaming row)."""

import pytest

from incident_pii_redactor_spark.sources.pages import write_pages_parquet
from incident_pii_redactor_spark.streaming.scrub_stream import (
    read_pages_stream,
    scrub_stream,
    windowed_metrics,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    # two "micro-batch" files
    write_pages_parquet(str(d / "part-0.parquet"), 150, seed=1)
    write_pages_parquet(str(d / "part-1.parquet"), 150, seed=2)
    return str(d)


def test_stream_scrub_end_to_end(spark, stream_dir, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("stream_out")
    pages = read_pages_stream(spark, stream_dir, max_files_per_trigger=1)
    assert pages.isStreaming
    scrubbed = scrub_stream(pages)
    q = (
        scrubbed.writeStream.format("parquet")
        .option("path", str(out_dir / "data"))
        .option("checkpointLocation", str(out_dir / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(out_dir / "data"))
    assert got.count() == 300
    assert got.filter("keep and n_redactions > 0").count() > 0


def test_windowed_metrics_stream(spark, stream_dir):
    # complete-mode memory sink: append mode would hold back the final
    # windows forever on a bounded stream (watermark never passes them)
    pages = read_pages_stream(spark, stream_dir)
    metrics = windowed_metrics(scrub_stream(pages), window="1 minute")
    q = (
        metrics.writeStream.outputMode("complete")
        .format("memory")
        .queryName("scrub_metrics")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    m = spark.sql("select * from scrub_metrics").toPandas()
    # warc_ts ramps 1 s/row from a fixed epoch -> multiple 1-min windows
    assert len(m) >= 3
    assert m["rows"].sum() == 300
    assert (m["kept"] <= m["rows"]).all()
