"""Judge + arbitration: per-span verdict fusion and replacement synthesis.

Re-expresses the reference's verify/arbitrate stages:

* C8  High-confidence auto-judge (``llm_verifier.py:186-227``): detections
  with confidence >= 0.95 bypass the judge. NB the reference *constructs*
  an auto-decision and then drops it (``continue`` at :221), so auto-judged
  spans reach arbitration with **no judge vote** — faithful semantics we
  replicate deliberately (documented divergence-from-intent, parity-with-
  behavior).
* C9  Judge fallback (``llm_verifier.py:291-319``, simulated twins at
  ``llm_clients.py:277-298,532-555``): email/credit_card/ssn -> REDACT,
  person_name -> PSEUDONYMIZE, else RETAIN, confidence 0.6. This is the
  engine's only judge path (no network, like the reference's default
  simulation mode).
* C2  Position-key union of stages (``arbitration_engine.py:352-401``).
* C3  Weighted vote: judge=3, finder=2, deterministic=1
  (``arbitration_engine.py:71-75,100-117``).
* C4  Force rules (``arbitration_engine.py:78-88,94-98``): email/phone/
  credit_card/ssn/api_key/secret_value -> always REDACT; person_name/
  hostname/ip_address/customer_id -> PSEUDONYMIZE (context-dependent).
* C5  Context adjustment (``arbitration_engine.py:127-150``): public
  indicators -> RETAIN person names; security-incident indicators upgrade
  RETAIN -> PSEUDONYMIZE.
* R3  Redaction tokens (``arbitration_engine.py:174-183``).
* R4  md5 pseudonyms (``arbitration_engine.py:158-189``) — pure functions
  of the original text, hence reproducible across cluster sizes; no cache
  needed (the reference's per-doc cache at :199-217 is effectively
  global-per-process and observably equivalent to pure recompute).
"""

from __future__ import annotations

import hashlib

from incident_pii_redactor_spark.core.spans import (
    PSEUDONYMIZE,
    REDACT,
    RETAIN,
    SRC_DETERMINISTIC,
    SRC_FINDER,
    SRC_JUDGE,
    Span,
    resolve_overlaps,
)

# C3 — vote weights (reference arbitration_engine.py:71-75)
VOTE_WEIGHTS = {SRC_JUDGE: 3.0, SRC_FINDER: 2.0, SRC_DETERMINISTIC: 1.0}

# C4 — force rules (reference arbitration_engine.py:78-88,94-98)
FORCE_REDACT = frozenset(
    {"email", "phone", "credit_card", "ssn", "api_key", "secret_value",
     # round-2 entity types: financial/medical/birth identifiers are
     # always redacted (no plausible deterministic fake exists)
     "iban", "nhs", "date_of_birth"}
)
DEFAULT_PSEUDONYMIZE = frozenset(
    {
        "person_name", "hostname", "ip_address", "customer_data_refs",
        # round-2: places get deterministic fakes, not tokens
        "address", "location",
        # infra identifiers (D3): the pseudonym shapes REF-{h}/#channel-{h}
        # and the validator's exclusion list always intended these to be
        # pseudonymized; without this entry the C9 judge fallback's RETAIN
        # vote (weight 3) silently won and they leaked verbatim
        "jira_ticket", "slack_channel", "kubernetes_pod", "docker_image",
        "internal_url", "aws_arn",
    }
)

# R3 — redaction token table (reference arbitration_engine.py:174-183)
REDACTION_TOKENS = {
    "email": "[REDACTED_EMAIL]",
    "phone": "[REDACTED_PHONE]",
    "credit_card": "[REDACTED_CARD]",
    "ssn": "[REDACTED_SSN]",
    "api_key": "[REDACTED_KEY]",
    "secret_value": "[REDACTED_SECRET]",
    "person_name": "[REDACTED_NAME]",
    "hostname": "[REDACTED_HOST]",
    "ip_address": "[REDACTED_IP]",
    "iban": "[REDACTED_IBAN]",
    "nhs": "[REDACTED_NHS]",
    "date_of_birth": "[REDACTED_DOB]",
    "address": "[REDACTED_ADDRESS]",
    "location": "[REDACTED_LOCATION]",
}
DEFAULT_TOKEN = "[REDACTED]"

# C6 — finder-category -> default action (reference arbitration_engine.py:403-421)
FINDER_ACTIONS = {
    "employment_info": REDACT,
    "salary_info": REDACT,
    "internal_platforms": PSEUDONYMIZE,
    "internal_metrics": RETAIN,
    "customer_data_refs": PSEUDONYMIZE,
    "intellectual_property": REDACT,
    "investigation_details": REDACT,
}

# C5 — context indicator phrases (reference arbitration_engine.py:127-150)
_PUBLIC_INDICATORS = ("press release", "public statement", "publicly available")
_SECURITY_INDICATORS = ("security incident", "data breach", "unauthorized access")
_INTERNAL_DISCUSSION = ("internal only", "do not distribute")


def _h(text: str) -> str:
    return hashlib.md5(text.lower().encode("utf-8")).hexdigest()


def pseudonym(entity_type: str, text: str) -> str:
    """R4 — deterministic md5-prefix pseudonyms (arbitration_engine.py:158-189)."""
    h = _h(text)
    if entity_type == "email":
        return f"user_{h[:4]}@company.com"
    if entity_type == "person_name":
        return f"Person_{h[:6]}"
    if entity_type == "hostname":
        return f"server-{h[:3]}.internal"
    if entity_type == "ip_address":
        return f"192.168.1.{int(h[0], 16) % 254 + 1}"
    if entity_type == "phone":
        return f"+1-555-{h[:3]}-{h[3:7]}"
    if entity_type == "credit_card":
        return f"CARD-****-****-****-{h[:4]}"
    if entity_type == "ssn":
        return f"SSN-***-**-{h[:4]}"
    if entity_type == "customer_data_refs":
        return f"CUST_{h[:8]}"
    if entity_type == "api_key":
        return f"API_{h[:12]}"
    if entity_type == "jira_ticket":
        return f"REF-{h[:6]}"
    if entity_type == "slack_channel":
        return f"#channel-{h[:4]}"
    if entity_type == "address":
        # deterministic fake street (R5 seed-keyed-fake family)
        return f"{100 + int(h[:3], 16) % 900} Elm Street"
    if entity_type == "location":
        return f"City_{h[:4]}"
    return f"ENT_{h[:6]}"


def judge_spans(spans: list[Span]) -> dict[str, Span]:
    """C8+C9: produce judge votes keyed by position (``start:end``).

    Spans with confidence >= 0.95 are auto-judged — and, per the reference's
    observed behavior (llm_verifier.py:221 ``continue``), their decision is
    DROPPED: they get no judge vote. Everything else gets the C9 fallback.
    """
    votes: dict[str, Span] = {}
    for s in spans:
        if s.confidence >= 0.95:
            continue  # C8: auto-judge decision constructed-then-dropped
        if s.entity_type in ("email", "credit_card", "ssn"):
            action = REDACT
        elif s.entity_type == "person_name":
            action = PSEUDONYMIZE
        else:
            action = RETAIN
        votes[s.key()] = s.copy(source=SRC_JUDGE, action=action, confidence=0.6)
    return votes


def _vote(candidates: list[Span]) -> tuple[str, float]:
    """C3: argmax of summed source weights per action; deterministic
    tie-break on action name (REDACT < RETAIN < PSEUDONYMIZE alphabetical
    would be arbitrary — we break ties toward the safer action:
    REDACT > PSEUDONYMIZE > RETAIN)."""
    totals: dict[str, float] = {}
    for c in candidates:
        totals[c.action] = totals.get(c.action, 0.0) + VOTE_WEIGHTS[c.source]
    safety = {REDACT: 2, PSEUDONYMIZE: 1, RETAIN: 0}
    action = max(totals, key=lambda a: (totals[a], safety[a]))
    conf = max(c.confidence for c in candidates if c.action == action)
    return action, conf


def _default_action(span: Span) -> str:
    """C6 + C4 defaults: what a source proposes absent any vote."""
    if span.entity_type in FORCE_REDACT:
        return REDACT
    if span.entity_type in DEFAULT_PSEUDONYMIZE:
        return PSEUDONYMIZE
    if span.source == SRC_FINDER:
        return FINDER_ACTIONS.get(span.entity_type, RETAIN)
    return RETAIN


def arbitrate(
    text: str,
    deterministic: list[Span],
    finder: list[Span],
    policy=None,
    judge_fn=None,
) -> tuple[list[Span], dict[str, int]]:
    """C2-C7: fuse stages into final per-span decisions + stats.

    Returns (final spans with action/replacement set, counters dict with
    keys conflicts_resolved / force_rules_applied / context_adjustments —
    reference arbitration_engine.py:288-296). ``policy`` (core.policy.Policy)
    overrides force rules / tokens / exceptions; None = built-in defaults.
    ``judge_fn(text, spans) -> {key: Span}`` replaces the built-in judge
    simulation (the reference's ``use_real_api`` seam, no network).
    """
    if policy is None:
        from incident_pii_redactor_spark.core.policy import DEFAULT_POLICY

        policy = DEFAULT_POLICY
    stats = {"conflicts_resolved": 0, "force_rules_applied": 0,
             "context_adjustments": 0}

    # C2 — position-key union: deterministic first, finder appended/merged
    by_key: dict[str, list[Span]] = {}
    for s in deterministic:
        by_key.setdefault(s.key(), []).append(
            s.copy(action=_default_action(s))
        )
    for s in finder:
        bucket = by_key.setdefault(s.key(), [])
        bucket.append(s.copy(action=_default_action(s)))
        if len(bucket) > 1:
            stats["conflicts_resolved"] += 1
    if judge_fn is None:
        judge = judge_spans(deterministic + finder)
    else:
        judge = judge_fn(text, deterministic + finder)
    for key, vote in judge.items():
        if key in by_key:
            by_key[key].append(vote)

    lower = text.lower()
    is_public = any(p in lower for p in _PUBLIC_INDICATORS)
    is_security = any(p in lower for p in _SECURITY_INDICATORS)
    is_internal = any(p in lower for p in _INTERNAL_DISCUSSION)

    final: list[Span] = []
    for key in sorted(by_key, key=lambda k: tuple(map(int, k.split(":")))):
        candidates = by_key[key]
        base = candidates[0]
        action, conf = _vote(candidates)

        # C7 — policy exceptions force RETAIN before anything else
        if policy.is_exception(base.entity_type, base.text):
            final.append(base.copy(action=RETAIN, confidence=conf,
                                   replacement=""))
            continue

        # C4 — force rules override the vote
        if base.entity_type in policy.force_redact:
            if action != REDACT:
                stats["force_rules_applied"] += 1
            action = REDACT
        elif base.entity_type in policy.default_pseudonymize and action == RETAIN:
            # default-pseudonymize types only stay RETAIN via context below
            action = PSEUDONYMIZE
            stats["force_rules_applied"] += 1
        elif base.source == SRC_FINDER and action == RETAIN:
            # C6 — finder-category default beats the judge fallback's blind
            # RETAIN vote: without this, the fallback (weight 3) outvoted the
            # finder (weight 2) on every sub-0.95 span and all five
            # REDACT/PSEUDONYMIZE finder categories leaked verbatim
            mapped = FINDER_ACTIONS.get(base.entity_type, RETAIN)
            if mapped != RETAIN:
                action = mapped
                stats["force_rules_applied"] += 1

        # C5 — context adjustment
        if base.entity_type == "person_name":
            if is_public and not is_security:
                if action != RETAIN:
                    stats["context_adjustments"] += 1
                action = RETAIN
            elif is_internal and action == RETAIN:
                action = PSEUDONYMIZE
                stats["context_adjustments"] += 1
        # NB: the reference's C5 "security incident upgrades RETAIN ->
        # PSEUDONYMIZE for hostname/ip/customer ids" is subsumed here by the
        # stricter C4 default-pseudonymize rule above (those types never
        # reach this point as RETAIN), so context_adjustments counts only
        # person-name adjustments — a deliberate, safer divergence.

        if action == REDACT:
            replacement = policy.redaction_tokens.get(
                base.entity_type, policy.default_token
            )
        elif action == PSEUDONYMIZE:
            replacement = pseudonym(base.entity_type, base.text)
        else:
            replacement = ""
        final.append(
            base.copy(action=action, confidence=conf, replacement=replacement)
        )
    return resolve_overlaps(final), stats
