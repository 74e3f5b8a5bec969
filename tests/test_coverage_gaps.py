"""Direct unit tests for operators previously pinned only via pipeline
tests (the '—' rows in COVERAGE.md): C3 weighted vote, C8 auto-judge
drop, C9 judge fallback, D8 context windows, A8 text-reduction %, A9
replacement frequency."""

from __future__ import annotations

import pandas as pd

from incident_pii_redactor_spark.core.arbitration import (
    _vote,
    judge_spans,
)
from incident_pii_redactor_spark.core.detectors import context_window
from incident_pii_redactor_spark.core.spans import (
    PSEUDONYMIZE,
    REDACT,
    RETAIN,
    SRC_DETERMINISTIC,
    SRC_FINDER,
    SRC_JUDGE,
    Span,
)
from incident_pii_redactor_spark.core.validate import (
    replacement_frequency_issues,
)


def _sp(action, source, conf=0.5, start=0, end=4, etype="email"):
    return Span(start, end, etype, conf, "text", source=source, action=action)


# --- C3: weighted vote 3/2/1 -------------------------------------------------

def test_vote_judge_outweighs_finder_and_deterministic():
    # judge (3.0) REDACT vs finder (2.0) + det (1.0) = 3.0 RETAIN: equal
    # totals break toward the SAFER action -> REDACT wins
    action, conf = _vote([
        _sp(REDACT, SRC_JUDGE, 0.9),
        _sp(RETAIN, SRC_FINDER, 0.8),
        _sp(RETAIN, SRC_DETERMINISTIC, 0.7),
    ])
    assert action == REDACT and conf == 0.9


def test_vote_majority_weight_wins_and_conf_is_max_of_winners():
    action, conf = _vote([
        _sp(PSEUDONYMIZE, SRC_FINDER, 0.6),
        _sp(PSEUDONYMIZE, SRC_DETERMINISTIC, 0.95),
        _sp(REDACT, SRC_DETERMINISTIC, 0.99),
    ])
    # 3.0 PSEUDONYMIZE > 1.0 REDACT; conf = max over WINNING action only
    assert action == PSEUDONYMIZE and conf == 0.95


def test_vote_tie_breaks_toward_safer_action():
    action, _ = _vote([
        _sp(RETAIN, SRC_FINDER, 0.5),       # 2.0
        _sp(REDACT, SRC_FINDER, 0.5),       # 2.0
    ])
    assert action == REDACT


# --- C8 + C9: judge votes ----------------------------------------------------

def test_judge_auto_drops_high_confidence_span():
    """C8: >=0.95 confidence constructs-then-DROPS the judge decision
    (reference llm_verifier.py:221 `continue`) — no vote recorded."""
    votes = judge_spans([_sp(RETAIN, SRC_DETERMINISTIC, conf=0.95)])
    assert votes == {}


def test_judge_fallback_actions_by_entity_type():
    """C9: below the auto-judge bar, the fallback votes by entity type
    with confidence 0.6 and source=judge."""
    spans = [
        _sp(RETAIN, SRC_DETERMINISTIC, 0.5, 0, 4, "email"),
        _sp(RETAIN, SRC_DETERMINISTIC, 0.5, 5, 9, "person_name"),
        _sp(RETAIN, SRC_DETERMINISTIC, 0.5, 10, 14, "hostname"),
    ]
    votes = judge_spans(spans)
    assert votes["0:4"].action == REDACT
    assert votes["5:9"].action == PSEUDONYMIZE
    assert votes["10:14"].action == RETAIN
    assert all(v.source == SRC_JUDGE and v.confidence == 0.6
               for v in votes.values())


# --- D8: context windows -----------------------------------------------------

def test_context_window_clamps_at_document_edges():
    text = "0123456789"
    assert context_window(text, 0, 2, radius=3) == "01234"
    assert context_window(text, 8, 10, radius=3) == "56789"
    assert context_window(text, 4, 6, radius=2) == "234567"


# --- A8: text-reduction % ----------------------------------------------------

def test_text_reduction_pct_column():
    from incident_pii_redactor_spark.operators.scrub import _process_batch
    from incident_pii_redactor_spark.quality.scorer import DRIVER_DOCS

    long_pii = ("please contact our engineer directly by email at "
                "someone.important@corpmail.example.com for the incident "
                "review meeting scheduled next week with the whole team "
                "and bring the full report " * 2)
    pdf = pd.DataFrame({"doc_id": [1], "text": [long_pii]})
    out = _process_batch(pdf, "text", ("doc_id",), DRIVER_DOCS,
                         scrub_dropped=True)
    red = float(out["text_reduction_pct"].iloc[0])
    scrubbed = out["text_scrubbed"].iloc[0]
    want = 100.0 * (1 - len(scrubbed) / len(long_pii))
    assert abs(red - want) < 1e-9
    assert "corpmail.example.com" not in scrubbed


# --- A9: replacement frequency -----------------------------------------------

def test_replacement_frequency_flags_only_over_limit():
    doc = "[REDACTED_EMAIL] " * 11 + "[REDACTED_IP] " * 3
    issues = replacement_frequency_issues(doc, limit=10)
    assert len(issues) == 1
    assert issues[0]["text"] == "[REDACTED_EMAIL]x11"
    assert replacement_frequency_issues(doc, limit=11) == []
