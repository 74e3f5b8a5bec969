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
    first_unseen = not already
    for pdf in pdfs:
        if first_unseen and len(pdf):
            # deterministic representative: smallest url wins within batch
            yield pdf.sort_values("url").head(1).drop(columns=["_fp"])
            first_unseen = False
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
