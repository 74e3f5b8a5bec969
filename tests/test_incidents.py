"""Incident JSONL source: flatten projection + end-to-end scrub parity
with the reference's semantic contract (title/summary/participants PII
redacted, FIXTURES.md F2 shape)."""

import json

import pytest

from incident_pii_redactor_spark.operators import quality_scrub
from incident_pii_redactor_spark.quality.scorer import QualityConfig
from incident_pii_redactor_spark.sources.incidents import (
    incidents_as_documents,
    read_incidents_jsonl,
)

SCRUB_ONLY = QualityConfig(  # incidents are scrubbed, never quality-dropped
    allowed_langs=("en", "de", "es", "fr", "zh", "und"),
    min_words=0, min_stopword_ratio=0.0, min_alpha_frac=0.0,
    min_mean_word_len=0.0, max_symbol_ratio=1e9, max_perplexity=1e18,
    min_lang_conf=0.0,
)

INCIDENTS = [
    {
        "id": "INC-1001",
        "title": "Database outage in production",
        "summary": "Contact dba john.smith@corp1.com for the postmortem",
        "description": "Root cause traced to host db-01.corp at 10.2.3.4",
        "participants": [
            {"id": "u1", "name": "John Smith", "email": "john.smith@corp1.com",
             "role": "responder"},
        ],
        "timelineEvents": [
            {"id": "t1", "type": "note", "title": "page",
             "content": "Paged on-call at +1-555-123-4567",
             "createdAt": "2025-01-01T00:00:00Z",
             "user": {"id": "u1", "name": "Mary Jones",
                      "email": "mary.j@corp1.com"}},
        ],
        "comments": ["ssn collected by mistake: 123-45-6789"],
    },
    {
        "incident_id": "rootly-77",
        "title": "Minor alert",
        "summary": "noise",
        "description": "nothing sensitive here",
        "participants": [],
        "timelineEvents": [],
        "comments": [],
    },
    {
        "title": "No id incident!",
        "summary": "fallback id path",
        "description": "",
        "participants": None,
        "timelineEvents": None,
        "comments": None,
    },
]


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("inc") / "incidents.jsonl"
    p.write_text("\n".join(json.dumps(i) for i in INCIDENTS))
    return str(p)


def test_flatten_and_ids(spark, jsonl_path):
    docs = incidents_as_documents(read_incidents_jsonl(spark, jsonl_path))
    rows = {r.incident_key: r.text for r in docs.collect()}
    assert set(rows) == {"INC-1001", "rootly-77", "incident_no-id-incident-"}
    t = rows["INC-1001"]
    assert t.startswith("Title: Database outage")
    assert "- John Smith (john.smith@corp1.com)" in t
    assert "Paged on-call at +1-555-123-4567 [by mary.j@corp1.com]" in t
    assert "ssn collected by mistake: 123-45-6789" in t


def test_incident_scrub_end_to_end(spark, jsonl_path):
    docs = incidents_as_documents(read_incidents_jsonl(spark, jsonl_path))
    out = quality_scrub(docs, id_cols=("incident_key",), cfg=SCRUB_ONLY)
    row = {r.incident_key: r for r in out.collect()}["INC-1001"]
    assert row.keep
    s = row.text_scrubbed
    for leaked in ("john.smith@corp1.com", "mary.j@corp1.com",
                   "+1-555-123-4567", "123-45-6789", "John Smith"):
        assert leaked not in s, leaked
    assert "[REDACTED_EMAIL]" in s and "[REDACTED_PHONE]" in s
    assert "[REDACTED_SSN]" in s and "Person_" in s
    assert row.residual_pii == 0
