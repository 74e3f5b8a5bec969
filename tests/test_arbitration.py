"""Arbitration semantics: force rules, context adjustment, judge fallback,
validation metrics (SURVEY.md §2.4-2.6 C3-C9, A5)."""

from incident_pii_redactor_spark.core import scrub_document
from incident_pii_redactor_spark.core.arbitration import pseudonym
from incident_pii_redactor_spark.core.validate import (
    adversarial_scan,
    quality_metrics,
    residual_pii,
)


def test_force_redact_beats_context():
    # emails are force-REDACT even in public-indicator docs (C4 over C5)
    t = "Press release, publicly available. Contact press@corp1.com."
    out = scrub_document(t).text_scrubbed
    assert "[REDACTED_EMAIL]" in out


def test_public_context_retains_person():
    t = "Press release, publicly available: John Smith announced results."
    assert "John Smith" in scrub_document(t).text_scrubbed


def test_security_context_overrides_public_for_person():
    t = ("Press release about the security incident and data breach: "
         "John Smith investigated.")
    out = scrub_document(t).text_scrubbed
    assert "John Smith" not in out


def test_pseudonym_pure_function():
    assert pseudonym("email", "A@B.com") == pseudonym("email", "a@b.com")
    assert pseudonym("person_name", "John Smith").startswith("Person_")
    last_octet = int(pseudonym("ip_address", "10.0.0.1").rsplit(".", 1)[1])
    assert 1 <= last_octet <= 254


def test_residual_scan_ignores_own_placeholders():
    processed = ("Done: [REDACTED_EMAIL] and Person_ab12cd plus "
                 "user_0f3a@company.com and 192.168.1.77.")
    assert residual_pii(processed) == []


def test_residual_scan_catches_missed_pii():
    issues = residual_pii("Oops leaked bob@real-corp.com after scrub.")
    assert any(i["issue_type"] == "residual_email" for i in issues)


def test_adversarial_scan_spaced_email():
    issues = adversarial_scan("mail me j . doe @ mail . com ok")
    assert any(i["issue_type"] == "adversarial_spaced_email" for i in issues)


def test_quality_metrics_formulas():
    m = quality_metrics(10, [])
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1_score"] == 1.0
    m2 = quality_metrics(
        8, [{"issue_type": "residual_email", "severity": "critical"}]
    )
    assert m2["residual_pii_count"] == 1
    assert 0 < m2["precision"] < 1
    assert m2["overall_quality_score"] == 0.7


def test_end_to_end_zero_residual_on_pii_doc():
    t = ("Incident: card 4532-0151-1283-0366, ssn 123-45-6789, "
         "email a.b@corp1.com, phone +1-555-123-4567, ip 10.0.1.45.")
    r = scrub_document(t)
    assert r.metrics["residual_pii_count"] == 0
    assert r.n_redactions >= 5


def test_policy_exceptions_and_custom_tokens(tmp_path):
    import json

    from incident_pii_redactor_spark.core.policy import Policy

    p = tmp_path / "policy.json"
    p.write_text(json.dumps({
        "exceptions": {"email": ["support@corp1.com"]},
        "redaction_tokens": {"email": "<EMAIL-GONE>"},
    }))
    policy = Policy.from_json(str(p))
    t = "Write support@corp1.com or personal bob.lee@corp1.com today."
    out = scrub_document(t, policy).text_scrubbed
    assert "support@corp1.com" in out        # C7 exception retained
    assert "bob.lee@corp1.com" not in out
    assert "<EMAIL-GONE>" in out             # custom R3 token


def test_default_policy_matches_constants():
    from incident_pii_redactor_spark.core.policy import DEFAULT_POLICY

    t = "mail x@y.io now"
    assert scrub_document(t).text_scrubbed == scrub_document(t, DEFAULT_POLICY).text_scrubbed


def test_finder_categories_act():
    # regression: the judge fallback's RETAIN vote used to outvote every
    # finder category, leaking all contextual detections verbatim
    t = ("Incident report: employee id EMP48213 was involved, with a "
         "salary of $120,000.00 under investigation id INVST882 today.")
    out = scrub_document(t).text_scrubbed
    assert "$120,000.00" not in out           # salary_info -> REDACT
    assert "employee id EMP48213" not in out  # employment_info -> REDACT
    assert "[REDACTED]" in out


def test_internal_metrics_finder_stays_retained():
    t = "Quarterly update: churn of 3,200 accounts discussed internally."
    # internal_metrics maps to RETAIN in FINDER_ACTIONS — unchanged text
    assert scrub_document(t).text_scrubbed == t


def test_judge_seam_pluggable():
    """The judge_fn seam (reference use_real_api, llm_clients.py:79-98):
    a custom judge can flip a decision; the default stays byte-identical;
    passing the built-in simulation explicitly changes nothing."""
    from incident_pii_redactor_spark.core import scrub_document
    from incident_pii_redactor_spark.core.arbitration import judge_spans
    from incident_pii_redactor_spark.core.spans import REDACT, SRC_JUDGE

    text = "the prod cluster is fine"
    base = scrub_document(text).text_scrubbed
    assert "prod" in base  # bare keyword: advisory 0.3 span, RETAINed

    def aggressive_judge(t, spans):
        return {
            s.key(): s.copy(source=SRC_JUDGE, action=REDACT, confidence=0.9)
            for s in spans if s.entity_type == "internal_keyword"
        }

    flipped = scrub_document(text, judge_fn=aggressive_judge).text_scrubbed
    assert "prod" not in flipped and "[REDACTED]" in flipped

    # explicit built-in == default (byte identity preserved)
    same = scrub_document(text, judge_fn=lambda t, s: judge_spans(s))
    assert same.text_scrubbed == base
