"""Pure per-document functions (no Spark imports).

This package is the semantic heart of the engine AND the test oracle:
the Spark pipeline calls exactly these functions from inside Arrow
batches, and the pytest oracle calls them row-at-a-time, so Spark output
is byte-identical to the oracle by construction — the tests then verify
the Spark *plumbing* (batching, partitioning, resume, parallelism
invariance) rather than two divergent reimplementations.

Everything here is deterministic: md5-based pseudonyms, no wall-clock,
no RNG (cf. reference's ``datetime.now()`` stamps, e.g.
``src/processing/deterministic_extractor.py:187``, consciously dropped).
"""

from incident_pii_redactor_spark.core.pipeline import ScrubResult, scrub_document
from incident_pii_redactor_spark.core.spans import Span, resolve_overlaps, splice

__all__ = ["Span", "ScrubResult", "resolve_overlaps", "scrub_document", "splice"]
