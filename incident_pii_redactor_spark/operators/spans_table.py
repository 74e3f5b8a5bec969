"""Span-table operator: explode per-document scrub decisions to rows.

SURVEY.md §1.2: span lists live INSIDE the pandas UDF at scale and are
"never exploded at 10^12 scale; explodable for debugging/tests". This is
that debug path — a UDTF-shaped 1->N ``mapInPandas`` producing one row
per final arbitrated span, so auditors can groupBy entity_type/action,
sample contexts, and diff detector versions with plain SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from incident_pii_redactor_spark.core.detectors import context_window
from incident_pii_redactor_spark.core.pipeline import scrub_document

SPAN_SCHEMA = (
    "start int, end int, entity_type string, action string, "
    "confidence double, source string, matched_text string, "
    "replacement string, context string"
)


def scrub_spans(df: DataFrame, text_col: str = "text",
                id_cols: tuple = ("url",), policy=None) -> DataFrame:
    """One row per final arbitrated span (including RETAINed ones)."""
    src_schema = dict(zip(df.schema.names, [f.dataType.simpleString()
                                            for f in df.schema.fields]))
    id_schema = ", ".join(f"{c} {src_schema[c]}" for c in id_cols)
    schema = f"{id_schema}, {SPAN_SCHEMA}"
    pruned = df.select(*id_cols, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                text = getattr(rec, text_col) or ""
                for s in scrub_document(text, policy).spans:
                    rows.append(
                        tuple(getattr(rec, c) for c in id_cols)
                        + (s.start, s.end, s.entity_type, s.action,
                           float(s.confidence), s.source, s.text,
                           s.replacement,
                           context_window(text, s.start, s.end))
                    )
            cols = list(id_cols) + [
                "start", "end", "entity_type", "action", "confidence",
                "source", "matched_text", "replacement", "context",
            ]
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(run, schema=schema)
