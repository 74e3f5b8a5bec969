"""Reference-parity LLM judge client behind the ``judge_fn`` seam.

The engine's arbitration already exposes ``judge_fn(text, spans) ->
{key: Span}`` (the reference's ``use_real_api`` switch, O5). This module
supplies the client that the reference implements against a real API
(``src/processing/llm_verifier.py:148-160`` batching + pacing,
``src/core/llm_clients.py:79-98`` per-call error handling), with the
TRANSPORT injected — this sandbox has no network, and at Spark scale the
transport would be an executor-local HTTP pool anyway. Replicated
semantics, with reference citations:

* C8 pre-filter (``llm_verifier.py:188-199``): spans with confidence
  >= 0.95 are auto-decided and skipped — UNLESS the entity type contains
  'secret', which is always judged.
* Batch-of-5 with 1 s inter-batch pacing, no sleep after the final
  batch (``llm_verifier.py:148-160``). The clock is injected so tests
  assert pacing without wall time.
* Decision mapping REDACT/PSEUDONYMIZE/RETAIN, case-insensitive,
  unknown -> RETAIN (``llm_verifier.py:282-290``).
* C9 fallback on ANY transport error (``llm_verifier.py:271-277``
  -> ``_create_fallback_decision``): email/credit_card/ssn -> REDACT,
  person_name -> PSEUDONYMIZE, else RETAIN; the error is counted, never
  raised — one bad API call must not kill a 10^12-doc job.

When no client is plugged in (``judge_fn=None``), arbitration keeps the
built-in ``judge_spans`` simulation and output stays byte-identical —
pinned by test_judge_client_default_parity.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from incident_pii_redactor_spark.core.spans import (
    PSEUDONYMIZE,
    REDACT,
    RETAIN,
    SRC_JUDGE,
    Span,
)

_DECISION_MAP = {"REDACT": REDACT, "PSEUDONYMIZE": PSEUDONYMIZE,
                 "RETAIN": RETAIN}


def fallback_action(entity_type: str) -> str:
    """C9 policy fallback (reference ``llm_verifier.py`` —
    ``_create_fallback_decision``)."""
    et = entity_type.lower()
    if "email" in et or "credit_card" in et or "ssn" in et:
        return REDACT
    if "person_name" in et:
        return PSEUDONYMIZE
    return RETAIN


class BatchJudgeClient:
    """``judge_fn``-shaped client: batches spans, paces between batches,
    maps transport decisions to actions, falls back per-span on errors.

    ``transport(text, span) -> dict`` is the single injected seam; it
    must return at least ``{"decision": "REDACT|PSEUDONYMIZE|RETAIN"}``
    and may include ``confidence`` (default 0.6 — the built-in
    simulation's judge confidence). Raise to trigger the C9 fallback.
    """

    def __init__(
        self,
        transport: Callable[[str, Span], dict],
        batch_size: int = 5,
        pacing_sec: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.transport = transport
        self.batch_size = batch_size
        self.pacing_sec = pacing_sec
        self._sleep = sleep
        self.stats = {"judged": 0, "auto_skipped": 0, "api_errors": 0,
                      "batches": 0}

    def __call__(self, text: str, spans: list[Span]) -> dict[str, Span]:
        need: list[Span] = []
        for s in spans:
            if s.confidence >= 0.95 and "secret" not in s.entity_type.lower():
                self.stats["auto_skipped"] += 1  # C8 auto-decide, dropped
                continue
            need.append(s)
        votes: dict[str, Span] = {}
        for i in range(0, len(need), self.batch_size):
            self.stats["batches"] += 1
            for s in need[i:i + self.batch_size]:
                try:
                    res = self.transport(text, s)
                    action = _DECISION_MAP.get(
                        str(res.get("decision", "")).upper(), RETAIN)
                    conf = float(res.get("confidence", 0.6))
                    self.stats["judged"] += 1
                except Exception:
                    self.stats["api_errors"] += 1
                    action = fallback_action(s.entity_type)
                    conf = 0.6
                votes[s.key()] = s.copy(source=SRC_JUDGE, action=action,
                                        confidence=conf)
            if i + self.batch_size < len(need):
                self._sleep(self.pacing_sec)
        return votes


def simulation_transport(text: str, span: Span) -> dict:
    """Transport that reproduces the built-in ``judge_spans`` policy
    mapping (``arbitration.py``) — useful as a deterministic stand-in
    and for the parity test."""
    if span.entity_type in ("email", "credit_card", "ssn"):
        decision = REDACT
    elif span.entity_type == "person_name":
        decision = PSEUDONYMIZE
    else:
        decision = RETAIN
    return {"decision": decision, "confidence": 0.6}
