"""Streaming WARC ingestion: a crawler drops ``*.warc.gz`` files into a
directory (or object-store prefix) and the engine ingests each NEW file
exactly once — the continuous version of ``sources/warc.read_warc``.

Composition, not reimplementation: Structured Streaming's file source
(``readStream.format("binaryFile")``) does the new-file tracking,
checkpointed exactly-once semantics, and ``maxFilesPerTrigger``
backpressure; the record parsing is the SAME ``records_to_page_rows``
streaming parser the batch reader uses (one task per file — WARC is
unsplittable — O(one record) memory, bomb-bounded). Downstream the
result is an ordinary streaming pages frame: it feeds the existing
streaming dedup/scrub stages unchanged.

Scale notes: a production crawl writes ~1 GB files; with
``max_files_per_trigger`` each microbatch is a bounded unit of work and
a crash replays at most one microbatch (file-source checkpointing).
The parse stage adds no state and no shuffle."""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from incident_pii_redactor_spark.sources.warc import (
    PAGES_SCHEMA,
    blobs_to_page_batches,
)


def read_warc_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 8,
                     max_record_bytes: int = 64 * 1024 * 1024,
                     batch_rows: int = 1024) -> DataFrame:
    """Streaming pages frame from a WARC drop directory. ``path`` is a
    glob the file source watches (e.g. ``/drops/*.warc.gz``)."""
    # streaming sources require an explicit schema; this is binaryFile's
    # fixed one
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("maxFilesPerTrigger", str(max_files_per_trigger))
             .load(path)
             .select("content"))

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield from blobs_to_page_batches(
                pdf["content"], max_record_bytes, batch_rows)

    return files.mapInPandas(parse, PAGES_SCHEMA)
