"""Streaming WARC ingestion (streaming/warc_stream.py): exactly-once
new-file semantics over the checkpointed file source."""

from __future__ import annotations

import pandas as pd

from incident_pii_redactor_spark.sources.pages import synth_pages
from incident_pii_redactor_spark.sources.warc import write_warc
from incident_pii_redactor_spark.streaming.warc_stream import (
    read_warc_stream,
)


def _drain(spark, drop_dir, out_dir, ck_dir):
    q = (read_warc_stream(spark, drop_dir + "/*.warc.gz",
                          max_files_per_trigger=1)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ck_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    assert not q.isActive  # drained queries must terminate (CLAUDE.md)


def test_stream_ingests_each_file_exactly_once(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warcstream")
    drops = d / "drops"
    drops.mkdir()
    pages = synth_pages(60, seed=19)
    write_warc(str(drops / "c0.warc.gz"), pages.iloc[:20])
    write_warc(str(drops / "c1.warc.gz"), pages.iloc[20:40])

    out, ck = str(d / "out"), str(d / "ck")
    _drain(spark, str(drops), out, ck)
    got1 = spark.read.parquet(out).toPandas()
    assert sorted(got1.url) == sorted(pages.iloc[:40].url)

    # a new crawl file lands; the SAME checkpoint ingests ONLY it
    write_warc(str(drops / "c2.warc.gz"), pages.iloc[40:])
    _drain(spark, str(drops), out, ck)
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 60
    assert sorted(got2.url) == sorted(pages.url)
    # byte identity survives the streaming path
    by_url = {r.url: bytes(r.html) for r in got2.itertuples()}
    for row in pages.itertuples():
        assert by_url[row.url] == bytes(row.html)
