"""Platform API incident collector — the engine's S3 (reference
``src/data_collection/rootly_collector.py``), with the HTTP TRANSPORT
injected: this sandbox has no network, and collection is inherently a
driver/edge activity — the cluster-side work starts where the collector
ends, at the JSONL the existing S1 scan reads
(``sources.incidents.read_incidents_jsonl``).

Replicated semantics, with reference citations:

* Page-loop pagination (``rootly_collector.py:73-97``): request pages
  while ``meta.pagination.pages > page``, stop early on an empty page,
  accumulate across pages.
* Date-window + ordering params (``:60-70``): ``created_at[gte]/[lte]``
  over a ``days_back`` window, newest first. The clock is a parameter —
  no wall-time reads inside the library.
* Partial results on persistent error (``:94-97``): the reference
  breaks the loop and KEEPS what it has; we do the same, after bounded
  retries with backoff (the reference's bare ``requests`` call retried
  zero times — the retry envelope is the one deliberate improvement,
  with the sleep injected for tests).
* Per-incident task enrichment (``:298-311``): each incident gains a
  ``tasks`` list; a failed task fetch yields ``[]`` for that incident
  rather than aborting the batch.
* JSONL sink (``:312-319``): one JSON object per line — exactly the
  shape ``read_incidents_jsonl`` declares a schema for, so
  collect -> write -> Spark scan is a tested end-to-end path.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from datetime import datetime, timedelta


class TransportError(Exception):
    """Raise from a transport to signal a retryable request failure."""


class IncidentCollector:
    """``transport(endpoint, params) -> dict`` is the injected seam —
    it plays the role of ``requests.get(...).json()``. Raise
    ``TransportError`` (or any Exception) to trigger the retry/partial
    logic."""

    def __init__(
        self,
        transport: Callable[[str, dict], dict],
        page_size: int = 100,
        max_retries: int = 2,
        backoff_sec: float = 1.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.transport = transport
        self.page_size = page_size
        self.max_retries = max_retries
        self.backoff_sec = backoff_sec
        self._sleep = sleep
        self.stats = {"pages": 0, "retries": 0, "errors": 0,
                      "incidents": 0}

    def _call(self, endpoint: str, params: dict) -> dict | None:
        """Bounded-retry transport call; None after retries exhaust
        (callers keep partial results, reference :94-97)."""
        for attempt in range(self.max_retries + 1):
            try:
                return self.transport(endpoint, params)
            except Exception:
                self.stats["errors"] += 1
                if attempt < self.max_retries:
                    self.stats["retries"] += 1
                    self._sleep(self.backoff_sec * (2 ** attempt))
        return None

    def collect_incidents(
        self,
        days_back: int = 30,
        limit: int | None = None,
        now: datetime | None = None,
    ) -> list[dict]:
        """Paginated fetch over a created-at window, newest first."""
        if now is None:
            now = datetime(1970, 1, 1)  # injected in real use; no wall clock
        start = now - timedelta(days=days_back)
        params = {
            "limit": self.page_size,
            "created_at[gte]": start.isoformat(),
            "created_at[lte]": now.isoformat(),
            "order[created_at]": "desc",
        }
        out: list[dict] = []
        page = 1
        while True:
            got = self._call("incidents", {**params, "page": page})
            if got is None:
                break  # persistent failure: keep partial results
            rows = got.get("data", [])
            out.extend(rows)
            self.stats["pages"] += 1
            # truncate BEFORE any loop exit: the limit must also apply
            # when the final page crosses it (review round 3)
            if limit is not None and len(out) >= limit:
                out = out[:limit]
                break
            pages_total = got.get("meta", {}).get("pagination", {}) \
                             .get("pages", 0)
            if not rows or pages_total <= page:
                break
            page += 1
        self.stats["incidents"] = len(out)
        return out

    def enrich_with_tasks(self, incidents: list[dict]) -> list[dict]:
        """Per-incident task fetch; a failed fetch yields [] for that
        incident instead of aborting the batch (reference :298-311)."""
        enriched = []
        for inc in incidents:
            got = self._call("tasks", {"incident_id": inc.get("id")})
            e = dict(inc)
            e["tasks"] = (got or {}).get("data", [])
            enriched.append(e)
        return enriched


def save_jsonl(rows: list[dict], path: str) -> int:
    """One JSON object per line — the shape S1's
    ``read_incidents_jsonl`` schema expects (reference :312-319)."""
    with open(path, "w") as f:
        for r in rows:
            json.dump(r, f)
            f.write("\n")
    return len(rows)
