"""Reference-parity judge client (VERDICT round-2 item 7): batching,
pacing, decision mapping, C8 pre-filter, C9 error fallback — all driven
through an injected transport and clock; no network, no Spark."""

from incident_pii_redactor_spark.core.judge_client import (
    BatchJudgeClient,
    simulation_transport,
)
from incident_pii_redactor_spark.core.spans import (
    PSEUDONYMIZE,
    REDACT,
    RETAIN,
    SRC_JUDGE,
    Span,
)


def _span(i, etype="email", conf=0.7):
    t = f"x{i}@example.org"
    return Span(start=i * 20, end=i * 20 + len(t), entity_type=etype,
                confidence=conf, text=t)


def test_batching_and_pacing():
    """12 spans -> 3 batches of 5/5/2; sleep(1.0) exactly twice (never
    after the final batch) — reference llm_verifier.py:148-160."""
    calls, sleeps = [], []
    client = BatchJudgeClient(
        transport=lambda text, s: calls.append(s.key()) or
        {"decision": "REDACT"},
        sleep=sleeps.append,
    )
    votes = client("doc", [_span(i) for i in range(12)])
    assert len(votes) == 12 and len(calls) == 12
    assert client.stats["batches"] == 3
    assert sleeps == [1.0, 1.0]


def test_c8_prefilter_skips_high_confidence_except_secrets():
    """conf >= 0.95 spans bypass the LLM (dropped decision) unless the
    type contains 'secret' — reference llm_verifier.py:188-199."""
    seen = []
    client = BatchJudgeClient(
        transport=lambda text, s: seen.append(s.entity_type) or
        {"decision": "RETAIN"},
    )
    spans = [_span(0, conf=0.99), _span(1, "client_secret", conf=0.99),
             _span(2, conf=0.5)]
    votes = client("doc", spans)
    assert seen == ["client_secret", "email"]
    assert client.stats["auto_skipped"] == 1
    assert spans[0].key() not in votes


def test_decision_mapping_case_insensitive_unknown_retains():
    client = BatchJudgeClient(
        transport=lambda text, s: {"decision": "pseudonymize"})
    v = client("doc", [_span(0, "person_name")])
    assert next(iter(v.values())).action == PSEUDONYMIZE
    client = BatchJudgeClient(
        transport=lambda text, s: {"decision": "SHRUG"})
    v = client("doc", [_span(0)])
    assert next(iter(v.values())).action == RETAIN


def test_c9_fallback_on_transport_error():
    """A raising transport must not propagate: per-type policy fallback,
    error counted — reference llm_verifier.py:271-277."""
    def boom(text, s):
        raise ConnectionError("socket reset")

    client = BatchJudgeClient(transport=boom)
    spans = [_span(0, "email"), _span(1, "person_name"), _span(2, "hostname")]
    votes = client("doc", spans)
    acts = {s.entity_type: v.action
            for s, v in zip(spans, votes.values())}
    assert acts == {"email": REDACT, "person_name": PSEUDONYMIZE,
                    "hostname": RETAIN}
    assert client.stats["api_errors"] == 3
    assert all(v.source == SRC_JUDGE for v in votes.values())


def test_judge_client_default_parity():
    """Plugging the client with the simulation transport reproduces the
    default (judge_fn=None) scrub byte-for-byte; leaving judge_fn unset
    remains the built-in path."""
    from incident_pii_redactor_spark.core.pipeline import scrub_document

    text = ("Contact Alice Johnson at alice.johnson@corpmail.com or "
            "call 415-555-0134 about server db-prod-03.")
    default = scrub_document(text)
    client = BatchJudgeClient(transport=simulation_transport,
                              sleep=lambda s: None)
    via_client = scrub_document(text, judge_fn=client)
    assert via_client.text_scrubbed == default.text_scrubbed
    assert via_client.redactions_by_type == default.redactions_by_type
