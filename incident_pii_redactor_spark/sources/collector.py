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
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from pathlib import Path


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


# --------------------------------------------------------------------------
# Multi-platform collection orchestrator — reference
# ``src/data_collection_orchestrator.py:54-160``, generalized from its
# single live platform (Rootly) to N injected collectors. Per-platform
# failure isolation (:95-108): one platform's exception becomes a failed
# CollectionResult, the others' outputs are kept. Per-platform JSONL
# files (:78-82) plus a merged ``all_incidents.jsonl`` (each row tagged
# with its platform) so the S1 scan ingests one path, and a
# ``collection_summary.json`` sidecar (:136-156).
# --------------------------------------------------------------------------

_EPOCH = datetime(1970, 1, 1)  # injected in real use; no wall clock


@dataclass
class CollectionResult:
    """Reference ``CollectionResult`` (:18-26), field-for-field."""

    platform: str
    incidents_collected: int
    output_file: str
    collection_time: str
    success: bool
    error_message: str | None = None


@dataclass
class CollectionSummary:
    """Reference ``CollectionSummary`` (:28-37), plus the merged path."""

    total_platforms: int
    successful_collections: int
    failed_collections: int
    total_incidents: int
    collection_results: list[CollectionResult] = field(default_factory=list)
    output_directory: str = ""
    collection_timestamp: str = ""
    merged_file: str = ""


class CollectionOrchestrator:
    """Thin fan-out over injected per-platform collectors.

    ``collectors`` maps platform name -> zero-arg callable returning the
    incident dicts (in practice ``lambda: IncidentCollector(t).collect_
    incidents(...)``) — the injection seam mirrors the reference's
    ``self.collectors`` registry (:47-49) and keeps this testable with
    no network."""

    def __init__(
        self,
        collectors: dict[str, Callable[[], list[dict]]],
        output_dir: str,
        now: Callable[[], datetime] = lambda: _EPOCH,
    ) -> None:
        if "all" in collectors:
            # 'all_incidents.jsonl' is the merged-output path; a platform
            # named 'all' would write the same file and its rows would be
            # silently truncated by the merge (review round 4)
            raise ValueError("platform name 'all' is reserved for the "
                             "merged output")
        self.collectors = dict(collectors)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self._now = now

    def get_supported_platforms(self) -> list[str]:
        return sorted(self.collectors)

    def collect_from_platform(self, platform: str) -> CollectionResult:
        """One platform; any collector exception -> failed result with
        the message, never an exception out (reference :95-108)."""
        ts = self._now().isoformat()
        if platform not in self.collectors:
            return CollectionResult(
                platform=platform, incidents_collected=0, output_file="",
                collection_time=ts, success=False,
                error_message=f"Unsupported platform: {platform}")
        try:
            rows = self.collectors[platform]()
            out = self.output_dir / f"{platform}_incidents.jsonl"
            save_jsonl(rows, str(out))
            return CollectionResult(
                platform=platform, incidents_collected=len(rows),
                output_file=str(out), collection_time=ts, success=True)
        except Exception as e:  # noqa: BLE001 — isolation IS the contract
            return CollectionResult(
                platform=platform, incidents_collected=0, output_file="",
                collection_time=ts, success=False, error_message=str(e))

    def collect_from_all_platforms(self) -> CollectionSummary:
        """Fan out across every registered platform; failures don't
        abort the loop. Writes per-platform JSONL, the merged
        ``all_incidents.jsonl`` (rows tagged ``platform``), and the
        ``collection_summary.json`` sidecar (reference :110-158)."""
        results = [self.collect_from_platform(p)
                   for p in self.get_supported_platforms()]
        merged = self.output_dir / "all_incidents.jsonl"
        n_merged = 0
        with open(merged, "w") as f:
            for r in results:
                if not r.success:
                    continue
                with open(r.output_file) as pf:
                    for line in pf:
                        if not line.strip():
                            continue
                        row = json.loads(line)
                        # setdefault: never clobber a collector-provided
                        # platform field (ADVICE round 4); the tag only
                        # fills rows that don't carry their own
                        row.setdefault("platform", r.platform)
                        json.dump(row, f)
                        f.write("\n")
                        n_merged += 1
        if n_merged == 0:
            # disk state must match the summary: merged_file="" means
            # NO merged file on disk, not an empty one (ADVICE round 4)
            merged.unlink(missing_ok=True)
        summary = CollectionSummary(
            total_platforms=len(results),
            successful_collections=sum(r.success for r in results),
            failed_collections=sum(not r.success for r in results),
            total_incidents=sum(r.incidents_collected for r in results),
            collection_results=results,
            output_directory=str(self.output_dir),
            collection_timestamp=self._now().isoformat(),
            merged_file=str(merged) if n_merged else "",
        )
        with open(self.output_dir / "collection_summary.json", "w") as f:
            json.dump({
                "total_platforms": summary.total_platforms,
                "successful_collections": summary.successful_collections,
                "failed_collections": summary.failed_collections,
                "total_incidents": summary.total_incidents,
                "output_directory": summary.output_directory,
                "collection_timestamp": summary.collection_timestamp,
                "merged_file": summary.merged_file,
                "platform_results": [vars(r) for r in results],
            }, f, indent=2)
        return summary

    def collection_statistics(self) -> dict:
        """Post-hoc stats over the output directory (reference
        ``get_collection_statistics`` :177-208): per-platform file sizes
        and incident counts re-derived from the files themselves."""
        stats = {"total_files": 0, "total_incidents": 0,
                 "platforms_with_data": [], "file_sizes": {}}
        for path in sorted(self.output_dir.glob("*_incidents.jsonl")):
            if path.name == "all_incidents.jsonl":
                continue  # the merged file is not a platform
            platform = path.stem.replace("_incidents", "")
            with open(path) as f:
                n = sum(1 for line in f if line.strip())
            stats["platforms_with_data"].append(platform)
            stats["total_files"] += 1
            stats["total_incidents"] += n
            stats["file_sizes"][platform] = {
                "file_size_mb": path.stat().st_size / (1024 * 1024),
                "incident_count": n,
            }
        return stats
