"""Custom stateful streaming operator: first-seen-wins exact dedup via
``applyInPandasWithState``.

A streaming crawl re-fetches pages; downstream training pipelines want
each distinct content exactly once. Spark has no built-in streaming
dedup-by-arbitrary-expression with TTL'd state, so this is the canonical
"custom stateful operator" shape (SURVEY.md §2.8 streaming row):

* key  = content fingerprint (md5 of normalized text, computed JVM-side
  by `functions.text.fingerprint` so the shuffle key never enters Python)
* state = a single seen-flag per fingerprint with a processing-time
  timeout (state TTL bounds memory at 10^12-doc scale: state size is
  O(distinct fingerprints within the TTL window), not O(stream))
* output = only the first row per fingerprint.

State store scaling: keys are uniform hashes, so the state shuffle has no
skew; RocksDB state backend handles spill on real clusters.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from incident_pii_redactor_spark.functions.text import fingerprint

STATE_SCHEMA = "seen boolean"


def _emit_first(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    already = state.exists and state.get[0]
    if not already:
        # deterministic representative across ALL Arrow chunks of the
        # group (large groups arrive as multiple chunks in shuffle-
        # dependent order). The key is None-safe and total: url ties
        # (re-fetches of the same url with identical text) break on
        # warc_ts so the survivor never depends on chunk order.
        best = None  # one-row DataFrame (keeps dtypes for Arrow)
        best_key = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            keys = list(
                zip(pdf["url"].fillna("").astype(str),
                    pdf["warc_ts"].astype(str))
            )
            i = min(range(len(keys)), key=keys.__getitem__)
            if best_key is None or keys[i] < best_key:
                best, best_key = pdf.iloc[[i]], keys[i]
        if best is not None:
            yield best.drop(columns=["_fp"])
    else:
        for _ in pdfs:  # drain the iterator; nothing to emit
            pass
    state.update((True,))
    state.setTimeoutDuration(24 * 3600 * 1000)  # 24h TTL


def streaming_exact_dedup(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """First occurrence per content fingerprint across the whole stream
    (within the state TTL). Input: streaming DataFrame with url/text."""
    keyed = pages.withColumn("_fp", fingerprint(text_col))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pages.schema.fields
    )
    return keyed.groupBy("_fp").applyInPandasWithState(
        _emit_first,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
