"""Span model, overlap resolution, and text splicing.

The reference's central IR is a character-offset interval ``[start, end)``
into the document string (``src/core/pii_detector.py:13-21`` PIIOccurrence,
``src/processing/deterministic_extractor.py:24-36`` DeterministicResult).
We keep the same IR as a lightweight dataclass; at the Spark layer span
lists live *inside* a pandas UDF and are never exploded to rows at scale.

Semantics replicated (and where we consciously diverge):

* Greedy overlap resolution (reference ``deterministic_extractor.py:320-344``):
  sort by start; on overlap keep the higher-confidence span, confidence tie
  -> shorter text. We add a final total-order tiebreak on
  ``(entity_type, start)`` so the result is data-independent — required for
  byte-identical output under any partitioning (SURVEY.md §7 "hard parts").
* Descending-offset splice (reference ``arbitration_engine.py:222-272``):
  replace from the end of the string backwards so earlier offsets stay
  valid; verify ``text[start:end]`` matches the recorded span text, re-search
  within ±10 chars on mismatch, skip the span if still not found.
"""

from __future__ import annotations

from dataclasses import dataclass

# Actions — reference enum RedactionAction (src/policies/policy_manager.py:21-25)
REDACT = "REDACT"
PSEUDONYMIZE = "PSEUDONYMIZE"
RETAIN = "RETAIN"

# Span sources (provenance, reference arbitration_engine.py:22-51 decision_sources)
SRC_DETERMINISTIC = "deterministic"
SRC_FINDER = "finder"
SRC_JUDGE = "judge"


@dataclass
class Span:
    """One detected entity occurrence: ``[start, end)`` into the document."""

    start: int
    end: int
    entity_type: str
    confidence: float
    text: str
    source: str = SRC_DETERMINISTIC
    action: str = RETAIN
    replacement: str = ""
    method: str = ""  # detection method: "regex" | "keyword" | "contextual" | ...

    def key(self) -> str:
        """Position key used for cross-stage union — reference
        ``arbitration_engine.py:352-401`` merges stages on ``f"{start}:{end}"``."""
        return f"{self.start}:{self.end}"

    def overlaps(self, other: "Span") -> bool:
        return self.start < other.end and other.start < self.end

    def copy(self, **kw) -> "Span":
        # manual field copy — dataclasses.replace() validates per call and
        # showed up as ~10% of the PII-doc scrub profile
        s = Span(self.start, self.end, self.entity_type, self.confidence,
                 self.text, self.source, self.action, self.replacement,
                 self.method)
        for k, v in kw.items():
            setattr(s, k, v)
        return s


def resolve_overlaps(spans: list[Span]) -> list[Span]:
    """Greedy overlap resolution with a TOTAL, data-independent order.

    Reference semantics (``deterministic_extractor.py:320-344``): sort by
    start; on overlap keep higher confidence; tie -> shorter matched text.
    Our extra tiebreak (entity_type, then start) makes the comparison a
    total order so output is identical regardless of detection order.
    """
    if not spans:
        return []
    ordered = sorted(spans, key=lambda s: (s.start, -s.end, s.entity_type))
    kept: list[Span] = []
    for span in ordered:
        if not kept or not kept[-1].overlaps(span):
            kept.append(span)
            continue
        prev = kept[-1]
        if _wins(span, prev):
            kept[-1] = span
    return kept


def _wins(challenger: Span, incumbent: Span) -> bool:
    """True if ``challenger`` should replace ``incumbent`` on overlap."""
    if challenger.confidence != incumbent.confidence:
        return challenger.confidence > incumbent.confidence
    if len(challenger.text) != len(incumbent.text):
        return len(challenger.text) < len(incumbent.text)  # tie -> shorter
    return (challenger.entity_type, challenger.start) < (
        incumbent.entity_type,
        incumbent.start,
    )


def covered_positions(spans: list[Span]) -> set[int]:
    """Position set used to skip re-detection of already-covered offsets —
    the reference's work-skipping filter (``deterministic_extractor.py:227-242``,
    ``llm_detector.py:101-118``)."""
    covered: set[int] = set()
    for s in spans:
        covered.update(range(s.start, s.end))
    return covered


def splice(text: str, spans: list[Span]) -> tuple[str, list[dict]]:
    """Apply non-RETAIN replacements, returning (new_text, lineage records).

    Descending-position splice with match verification and ±10-char
    re-search, per reference ``arbitration_engine.py:222-272``. Lineage
    records (one per applied/skipped span) feed the per-partition metrics
    layer instead of the reference's JSON audit files.
    """
    lineage: list[dict] = []
    out = text
    for span in sorted(spans, key=lambda s: (-s.start, s.end, s.entity_type)):
        if span.action == RETAIN or not span.replacement:
            continue
        start, end = span.start, span.end
        if out[start:end] != span.text:
            found = _research(out, span.text, start)
            if found is None:
                lineage.append(
                    {"entity_type": span.entity_type, "action": "SKIPPED_NO_MATCH",
                     "start": start, "end": end}
                )
                continue
            start, end = found, found + len(span.text)
        out = out[:start] + span.replacement + out[end:]
        lineage.append(
            {"entity_type": span.entity_type, "action": span.action,
             "start": start, "end": end}
        )
    lineage.reverse()  # ascending document order for stable output
    return out, lineage


def _research(text: str, needle: str, around: int, radius: int = 10) -> int | None:
    """±radius re-search on splice mismatch (reference arbitration_engine.py:236-246)."""
    lo = max(0, around - radius)
    hi = min(len(text), around + radius + len(needle))
    idx = text.find(needle, lo, hi)
    return idx if idx >= 0 else None
