"""Post-scrub validation: residual-PII scan, adversarial scan, quality metrics.

Re-expresses the reference's quality-validator stage:

* D9   Residual-PII scan on *processed* text
  (``quality_validator.py:68-79`` patterns, ``:90-131`` scan).
* D10  Exclusion predicate — placeholders our own scrub produced must not
  count as residual PII (``quality_validator.py:82-88,133-138``).
* D11  Adversarial/obfuscation scan: spaced emails/phones, partial SSNs,
  base64-ish and hex runs (``quality_validator.py:374-382,384-431``).
* A5   Quality metrics: precision/recall/F1 over decisions vs residuals,
  consistency, severity-weighted overall score
  (``quality_validator.py:527-577``).
* A9   Replacement-frequency check: any redaction token > 10x per doc
  (``quality_validator.py:344-368``).
* A11  Schema-integrity check: line-count equality, bracket/quote deltas
  (``quality_validator.py:171-254``, reduced to the structure-preserving
  core — our splice never adds/removes lines by construction).
"""

from __future__ import annotations

import re
from collections import Counter

from incident_pii_redactor_spark.core.detectors import (
    CARD_RE,
    EMAIL_RE,
    IBAN_RE,
    IP_RE,
    NHS_RE,
    PHONE_RE,
    SSN_RE,
    _DIGIT_RE,
    iban_valid,
    luhn_valid,
    nhs_valid,
)

# D10 — placeholders produced by our own scrub (reference :82-88)
_EXCLUSION_RE = re.compile(
    r"\[REDACTED(?:_[A-Z]+)?\]"
    r"|Person_[0-9a-f]{6}"
    r"|user_[0-9a-f]{4}@company\.com"
    r"|server-[0-9a-f]{3}\.internal"
    r"|\+1-555-[0-9a-f]{3}-[0-9a-f]{4}"
    r"|CARD-\*{4}-\*{4}-\*{4}-[0-9a-f]{4}"
    r"|SSN-\*{3}-\*{2}-[0-9a-f]{4}"
    r"|CUST_[0-9a-f]{8}|API_[0-9a-f]{12}|REF-[0-9a-f]{6}"
    r"|#channel-[0-9a-f]{4}|ENT_[0-9a-f]{6}"
    r"|\d{3} Elm Street|City_[0-9a-f]{4}"
    r"|192\.168\.1\.\d{1,3}"
    r"|\b(?:SEC|INC|JIRA)-\d+\b"
)

# D11 — obfuscation patterns (reference quality_validator.py:374-382)
ADVERSARIAL_PATTERNS: dict[str, re.Pattern] = {
    "spaced_email": re.compile(
        r"\b[\w.+-]+(?:\s*\.\s*[\w+-]+)*\s+@\s+[\w-]+(?:\s*\.\s*[\w-]+)+"
    ),
    "spaced_phone": re.compile(r"\b\d{3}\s+\d{3}\s+\d{4}\b"),
    "partial_ssn": re.compile(r"\b[Xx*]{3}-[Xx*]{2}-\d{4}\b"),
    "base64_blob": re.compile(r"\b[A-Za-z0-9+/]{40,}={1,2}(?!\w)"),
    "hex_run": re.compile(r"\b[0-9a-fA-F]{32,}\b"),
}


def _mask_exclusions(text: str) -> str:
    """Blank out our own placeholders so residual regexes can't match them."""
    return _EXCLUSION_RE.sub(lambda m: "\x00" * len(m.group()), text)


def residual_pii(processed: str, masked: str | None = None) -> list[dict]:
    """D9+D10: re-run core PII regexes on scrubbed text; each hit is a
    CRITICAL issue (a redaction the pipeline missed). ``masked`` lets the
    caller share one exclusion-masking pass with adversarial_scan."""
    has_digit = _DIGIT_RE.search(processed) is not None
    if "@" not in processed and not has_digit:
        return []  # every residual pattern requires '@' or a digit
    if masked is None:
        masked = _mask_exclusions(processed)
    issues: list[dict] = []

    def add(kind: str, m: re.Match, severity: str = "critical") -> None:
        issues.append(
            {"issue_type": f"residual_{kind}", "severity": severity,
             "location": m.start(), "text": m.group()}
        )

    if "@" in masked:
        for m in EMAIL_RE.finditer(masked):
            add("email", m)
    if has_digit:
        for m in SSN_RE.finditer(masked):
            add("ssn", m)
        for m in CARD_RE.finditer(masked):
            digits = re.sub(r"[- ]", "", m.group())
            if 13 <= len(digits) <= 19 and luhn_valid(digits):
                add("credit_card", m)
        for m in PHONE_RE.finditer(masked):
            if len(re.sub(r"\D", "", m.group())) >= 10:
                add("phone", m)
        for m in IP_RE.finditer(masked):
            add("ip_address", m, severity="high")
        for m in NHS_RE.finditer(masked):
            if nhs_valid(re.sub(r"[ -]", "", m.group())):
                add("nhs", m)
        for m in IBAN_RE.finditer(masked):
            if iban_valid(m.group()):
                add("iban", m)
    return issues


# exact gates: each adversarial pattern requires one of these substrings
# (hex_run has no cheap exact gate — letters a-f occur in all prose — so
# it always runs)
_ADVERSARIAL_GATES = {
    "spaced_email": ("@",),
    "spaced_phone": ("0", "1", "2", "3", "4", "5", "6", "7", "8", "9"),
    "partial_ssn": ("-",),
    "base64_blob": ("=",),
}


def adversarial_scan(processed: str, masked: str | None = None) -> list[dict]:
    """D11: obfuscated-PII heuristics on scrubbed text (severity high)."""
    if masked is None:
        masked = _mask_exclusions(processed)
    issues: list[dict] = []
    for kind, pat in ADVERSARIAL_PATTERNS.items():
        gates = _ADVERSARIAL_GATES.get(kind)
        if gates is not None and not any(g in masked for g in gates):
            continue
        for m in pat.finditer(masked):
            issues.append(
                {"issue_type": f"adversarial_{kind}", "severity": "high",
                 "location": m.start(), "text": m.group()}
            )
    return issues


def replacement_frequency_issues(processed: str, limit: int = 10) -> list[dict]:
    """A9: flag any redaction token appearing > limit times per doc."""
    counts = Counter(m.group() for m in re.finditer(r"\[REDACTED(?:_[A-Z]+)?\]",
                                                    processed))
    return [
        {"issue_type": "replacement_frequency", "severity": "medium",
         "location": -1, "text": f"{tok}x{n}"}
        for tok, n in sorted(counts.items())
        if n > limit
    ]


def schema_integrity_issues(original: str, processed: str) -> list[dict]:
    """A11 (core): line-count equality + bracket/quote count deltas > 2."""
    issues: list[dict] = []
    if original.count("\n") != processed.count("\n"):
        issues.append(
            {"issue_type": "line_count_changed", "severity": "high",
             "location": -1, "text": ""}
        )
    for ch, name in (("{", "brace"), ("(", "paren")):
        close = {"{": "}", "(": ")"}[ch]
        d0 = original.count(ch) - original.count(close)
        d1 = processed.count(ch) - processed.count(close)
        if abs(d0 - d1) > 2:
            issues.append(
                {"issue_type": f"{name}_balance_changed", "severity": "medium",
                 "location": -1, "text": ""}
            )
    return issues


_SEVERITY_WEIGHT = {"critical": 0.3, "high": 0.2, "medium": 0.1, "low": 0.05}


def quality_metrics(n_decisions: int, issues: list[dict]) -> dict:
    """A5: precision/recall/F1/consistency/overall
    (reference quality_validator.py:527-577 formulas)."""
    residual = sum(1 for i in issues if i["issue_type"].startswith("residual_"))
    if n_decisions > 0:
        precision = max(0.0, (n_decisions - residual) / n_decisions)
        recall = n_decisions / (n_decisions + residual)
        consistency = max(0.0, 1.0 - len(issues) / n_decisions)
    else:
        precision = 1.0 if residual == 0 else 0.0
        recall = 1.0 if residual == 0 else 0.0
        consistency = 1.0 if not issues else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    penalty = sum(_SEVERITY_WEIGHT.get(i["severity"], 0.05) for i in issues)
    overall = max(0.0, min(1.0, 1.0 - penalty))
    return {
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "residual_pii_count": residual,
        "consistency_score": consistency,
        "overall_quality_score": overall,
    }


def recommendations(metrics: dict, issues: list[dict]) -> list[str]:
    """A6: threshold rules over metrics/issues -> advisory strings
    (reference quality_validator.py:579-622)."""
    recs: list[str] = []
    if metrics.get("residual_pii_count", 0) > 0:
        recs.append("residual PII detected: review detector coverage for the "
                    "flagged types")
    if metrics.get("precision", 1.0) < 0.9:
        recs.append("precision below 0.9: tighten low-confidence patterns or "
                    "raise the splice threshold")
    if metrics.get("overall_quality_score", 1.0) < 0.7:
        recs.append("overall quality below 0.7: manual review recommended")
    if any(i["issue_type"].startswith("adversarial_") for i in issues):
        recs.append("obfuscated PII patterns present: consider enabling "
                    "aggressive normalization before detection")
    if any(i["issue_type"] == "replacement_frequency" for i in issues):
        recs.append("a redaction token repeats >10x in one document: verify "
                    "the source is not already templated")
    return recs


def validate(original: str, processed: str, n_decisions: int) -> tuple[list[dict], dict]:
    """Full validation pass: D9-D11 + A9 + A11 issues, then A5 metrics."""
    masked = _mask_exclusions(processed)
    issues = (
        residual_pii(processed, masked)
        + adversarial_scan(processed, masked)
        + replacement_frequency_issues(processed)
        + schema_integrity_issues(original, processed)
    )
    return issues, quality_metrics(n_decisions, issues)
