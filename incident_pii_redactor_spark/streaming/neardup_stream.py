"""Custom stateful streaming operator: first-seen-wins NEAR-dup dedup
via ``applyInPandasWithState`` (the streaming counterpart of the batch
``minhash_lsh_pairs`` + Jaccard-verify path in jobs/dedup.py).

Design — single-band key + full-signature verification:

* A doc's state key is ONE MinHash band (its first ``band_rows``
  minhashes, computed JVM-side by the same Catalyst expression the batch
  path uses, so the shuffle key never enters Python). One key means the
  admit/drop decision is ATOMIC — multi-band streaming would ask several
  independent state groups to agree on one doc, which
  applyInPandasWithState cannot express without a second stateful pass.
* Within a band group, a collision is only a CANDIDATE (same FP argument
  as the batch path): the incoming doc's full signature is compared
  against the signatures admitted earlier in this bucket, and it is
  dropped only when the fraction of agreeing minhashes — the standard
  MinHash estimate of Jaccard similarity — reaches ``threshold``.
  Admitted signatures are kept in state (bounded by ``max_kept``).
* Single-band recall is 1-(1-s^band_rows) per true near-dup pair —
  deliberately partial: the intended production topology is this cheap
  streaming pass for intra-window dups plus the batch dedup job as the
  periodic exact compaction (the same split the reference's
  collector/batch design implies).
* Docs too short to shingle carry the sentinel signature; they are
  routed to an exact-fingerprint key (``_short:md5(text)``) instead, so
  they still dedup exactly but can never near-dup-collide with each
  other (the batch path filters them for the same reason).
* TTL modes (shared with dedup_stream — see its module docstring for the
  availableNow timer measurement): ``event_ttl_ms`` (event-time,
  watermark-driven — bounds state AND terminates drained queries; the
  right default for cron-style repeated drains), ``ttl_ms``
  (processing-time — continuous deployments only), both 0 = NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from incident_pii_redactor_spark.functions.dedup import (
    _MH_P,
    minhash_signature,
)
from incident_pii_redactor_spark.streaming.dedup_stream import (
    _max_event_ms,
    _set_ttl,
    _timeout_conf,
)

STATE_SCHEMA = "sigs string"
_SIG_SEP = ";"


def _agreement(a: list[str], b: list[str]) -> float:
    return sum(x == y for x, y in zip(a, b)) / max(len(a), 1)


def _make_group_fn(threshold: float, max_kept: int, ttl_ms: int,
                   event_ttl_ms: int = 0):
    def dedup_group(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        kept: list[list[str]] = []
        if state.exists and state.get[0]:
            kept = [s.split("|") for s in state.get[0].split(_SIG_SEP)]
        # deterministic processing order across Arrow chunks: sort each
        # microbatch's rows by (url, warc_ts) so the survivor set never
        # depends on shuffle chunk order
        rows = []
        max_ev = 0  # group's max event time anchors the TTL (see _set_ttl)
        for pdf in pdfs:
            if len(pdf):
                rows.append(pdf)
                max_ev = max(max_ev, _max_event_ms(pdf))
        if rows:
            batch = pd.concat(rows, ignore_index=True)
            batch = batch.sort_values(
                ["url", "warc_ts"], kind="mergesort"
            ).reset_index(drop=True)
            emit = []
            for i in range(len(batch)):
                sig = str(batch["_sig"].iloc[i]).split("|")
                if any(_agreement(sig, k) >= threshold for k in kept):
                    continue  # near-dup of an admitted doc -> drop
                emit.append(i)
                if len(kept) < max_kept:
                    kept.append(sig)
            if emit:
                yield batch.iloc[emit].drop(columns=["_sig", "_key"])
        state.update((_SIG_SEP.join("|".join(s) for s in kept),))
        _set_ttl(state, ttl_ms, event_ttl_ms, max_ev)

    return dedup_group


def streaming_neardup_dedup(
    pages: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_perm: int = 8,
    band_rows: int = 2,
    threshold: float = 0.5,
    max_kept: int = 16,
    ttl_ms: int = 0,
    event_ttl_ms: int = 0,
    ts_col: str = "warc_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per near-dup class across the stream. Input:
    streaming DataFrame with url/warc_ts/text. TTL modes: see module
    docstring — ``event_ttl_ms`` (event-time, recommended), ``ttl_ms``
    (processing-time, continuous only), both 0 = unbounded state."""
    if event_ttl_ms > 0:
        pages = pages.withWatermark(ts_col, watermark_delay)
    sig = minhash_signature(text_col, n=n, n_perm=n_perm)
    sig_str = F.array_join(F.transform(sig, lambda v: v.cast("string")), "|")
    band = F.array_join(
        F.transform(F.slice(sig, 1, band_rows), lambda v: v.cast("string")),
        "|",
    )
    sentinel = str(_MH_P)
    keyed = pages.withColumn("_sig", sig_str).withColumn(
        "_key",
        F.when(
            F.split(F.col("_sig"), "\\|").getItem(0) != sentinel,
            F.concat(F.lit("band:"), band),
        ).otherwise(F.concat(F.lit("_short:"), F.md5(F.col(text_col)))),
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
    )
    return keyed.groupBy("_key").applyInPandasWithState(
        _make_group_fn(threshold, max_kept, ttl_ms, event_ttl_ms),
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_timeout_conf(ttl_ms, event_ttl_ms),
    )
