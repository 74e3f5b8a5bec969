"""Incident-record source: JSONL scan + text-flattening projection.

Parity layer for the reference's native input format (SURVEY.md §2.1-2.2):

* S1/S2  JSONL / JSON scan (``process_incidents.py:31-47``) ->
  ``spark.read.json`` with an explicit schema (never schema inference at
  scale — one pass saved and no surprise types).
* P1  Incident-ID projection: coalesce over candidate id fields with a
  slugged-title fallback (``process_incidents.py:51-68``).
* P2  Text-flattening projection: title/summary/description/participants/
  timeline/comments -> one document string (``process_incidents.py:70-116``)
  — pure Catalyst expressions (concat_ws/transform/aggregate), no UDF.

The flattened text then flows through the same ``quality_scrub`` operator
as web pages (with a permissive QualityConfig — incidents are not
filtered for quality, only scrubbed; reference behavior).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_user = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("email", StringType()),
    ]
)

INCIDENT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("incident_id", StringType()),
        StructField("incidentId", StringType()),
        StructField("ticket_id", StringType()),
        StructField("ticketId", StringType()),
        StructField("title", StringType()),
        StructField("summary", StringType()),
        StructField("description", StringType()),
        StructField("status", StringType()),
        StructField("severity", StringType()),
        StructField("created_at", StringType()),
        StructField(
            "participants",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("name", StringType()),
                        StructField("email", StringType()),
                        StructField("role", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "timelineEvents",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("type", StringType()),
                        StructField("title", StringType()),
                        StructField("content", StringType()),
                        StructField("createdAt", StringType()),
                        StructField("user", _user),
                    ]
                )
            ),
        ),
        StructField("comments", ArrayType(StringType())),
    ]
)


def read_incidents_jsonl(spark: SparkSession, path: str,
                         multi_line: bool = False) -> DataFrame:
    """S1/S2: line-delimited (default) or multiLine JSON."""
    return (
        spark.read.schema(INCIDENT_SCHEMA)
        .option("multiLine", multi_line)
        .json(path)
    )


# extra id aliases the reference probes (process_incidents.py:51-68):
# incidentId / ticket_id / ticketId. NB: platform-specific nested shapes
# (e.g. incident.io's timeline_events with summary/actor instead of
# content/user) need per-platform adapters — that is the reference's
# data_collection layer (SURVEY.md S3, out of scope); unknown shapes read
# as nulls and are dropped by incidents_as_documents' emptiness filter.
_ID_ALIAS_FIELDS = ("id", "incident_id", "incidentId", "ticket_id", "ticketId")


def incident_id() -> Column:
    """P1: coalesce over candidate id fields; fallback = slugged title."""
    slug = F.lower(F.regexp_replace(F.coalesce("title", F.lit("untitled")),
                                    "[^A-Za-z0-9]+", "-"))
    return F.coalesce(
        *[F.col(c) for c in _ID_ALIAS_FIELDS],
        F.concat(F.lit("incident_"), slug),
    ).alias("incident_key")


def flatten_text() -> Column:
    """P2: one document string per incident — same field order as the
    reference's flattening so scrubbed output is comparable:
    Title/Summary/Description, then participants '- name (email)' lines,
    then timeline 'content [by email]' lines, then comments."""
    participants = F.array_join(
        F.transform(
            F.coalesce("participants", F.array()),
            lambda p: F.concat(
                F.lit("- "), F.coalesce(p["name"], F.lit("unknown")),
                F.lit(" ("), F.coalesce(p["email"], F.lit("no-email")),
                F.lit(")"),
            ),
        ),
        "\n",
    )
    timeline = F.array_join(
        F.transform(
            F.coalesce("timelineEvents", F.array()),
            lambda e: F.concat(
                F.coalesce(e["content"], F.lit("")),
                F.lit(" [by "),
                F.coalesce(e["user"]["email"], F.lit("unknown")),
                F.lit("]"),
            ),
        ),
        "\n",
    )
    comments = F.array_join(F.coalesce("comments", F.array()), "\n")
    return F.concat_ws(
        "\n",
        F.concat(F.lit("Title: "), F.coalesce("title", F.lit(""))),
        F.concat(F.lit("Summary: "), F.coalesce("summary", F.lit(""))),
        F.concat(F.lit("Description: "), F.coalesce("description", F.lit(""))),
        F.concat(F.lit("Participants:\n"), participants),
        F.concat(F.lit("Timeline:\n"), timeline),
        F.concat(F.lit("Comments:\n"), comments),
    ).alias("text")


def incidents_as_documents(df: DataFrame) -> DataFrame:
    """Project incident records to the engine's (id, text) document shape.

    P3 (``process_incidents.py:35-37``): malformed/blank records are
    dropped. flatten_text always emits header boilerplate, so the filter
    keys on CONTENT — a record with no id, title, summary, or description
    (what a corrupt JSONL line parses to in PERMISSIVE mode) is noise;
    a bare length(text) > 0 check would keep it and collide every such
    row onto the 'incident_untitled' key."""
    has_content = F.coalesce(
        *[F.col(c) for c in _ID_ALIAS_FIELDS],
        F.col("title"), F.col("summary"), F.col("description"),
    ).isNotNull()
    out = df.filter(has_content).select(incident_id(), flatten_text())
    return out.filter(F.length("text") > 0)
