"""S3 platform collector (reference rootly_collector.py) with an
injected transport: pagination, retry/backoff, partial-on-failure,
task enrichment, and the collect -> JSONL -> Spark S1 scan round trip."""

from incident_pii_redactor_spark.sources.collector import (
    IncidentCollector,
    TransportError,
    save_jsonl,
)


def _incident(i):
    return {"id": f"inc-{i:03d}", "title": f"Outage {i}",
            "summary": "db down",
            "description": f"Contact ops-{i}@corpmail.com",
            "status": "resolved", "severity": "sev2",
            "created_at": "2025-01-01T00:00:00",
            "participants": [{"id": "u1", "name": "Alice Johnson",
                              "email": "alice@corpmail.com",
                              "role": "commander"}]}


def _paged_transport(pages, fail_times=0, log=None):
    """3-page style fake API; optionally fails the first N calls."""
    state = {"fails": fail_times}

    def transport(endpoint, params):
        if log is not None:
            log.append((endpoint, dict(params)))
        if state["fails"] > 0:
            state["fails"] -= 1
            raise TransportError("503")
        if endpoint == "incidents":
            p = params["page"]
            data = pages[p - 1] if p <= len(pages) else []
            return {"data": data,
                    "meta": {"pagination": {"pages": len(pages)}}}
        if endpoint == "tasks":
            return {"data": [{"id": f"task-for-{params['incident_id']}"}]}
        raise AssertionError(endpoint)

    return transport


def test_pagination_accumulates_all_pages():
    pages = [[_incident(i) for i in range(p * 2, p * 2 + 2)]
             for p in range(3)]
    log = []
    c = IncidentCollector(_paged_transport(pages, log=log), sleep=lambda s: 0)
    got = c.collect_incidents(days_back=7)
    assert [r["id"] for r in got] == [f"inc-{i:03d}" for i in range(6)]
    assert c.stats["pages"] == 3
    # date-window + ordering params on every request (reference :60-70)
    for _, params in log:
        assert params["order[created_at]"] == "desc"
        assert "created_at[gte]" in params and "created_at[lte]" in params


def test_retry_then_success_and_backoff():
    pages = [[_incident(0)]]
    sleeps = []
    c = IncidentCollector(_paged_transport(pages, fail_times=2),
                          max_retries=2, backoff_sec=0.5,
                          sleep=sleeps.append)
    got = c.collect_incidents()
    assert len(got) == 1
    assert sleeps == [0.5, 1.0]  # exponential backoff, injected clock
    assert c.stats["retries"] == 2


def test_persistent_failure_keeps_partial_results():
    """Page 2 dies even after retries -> page 1's rows are KEPT
    (reference :94-97 breaks and returns what it has)."""
    calls = {"n": 0}

    def transport(endpoint, params):
        calls["n"] += 1
        if params["page"] == 1:
            return {"data": [_incident(0)],
                    "meta": {"pagination": {"pages": 2}}}
        raise TransportError("boom")

    c = IncidentCollector(transport, max_retries=1, sleep=lambda s: 0)
    got = c.collect_incidents()
    assert [r["id"] for r in got] == ["inc-000"]
    assert c.stats["errors"] == 2  # initial + 1 retry on page 2


def test_enrichment_failure_yields_empty_tasks():
    def transport(endpoint, params):
        if endpoint == "tasks" and params["incident_id"] == "inc-001":
            raise TransportError("task api down")
        return {"data": [{"id": "t1"}]}

    c = IncidentCollector(transport, max_retries=0, sleep=lambda s: 0)
    enriched = c.enrich_with_tasks([_incident(0), _incident(1)])
    assert enriched[0]["tasks"] == [{"id": "t1"}]
    assert enriched[1]["tasks"] == []  # failed fetch, batch survives


def test_collect_to_jsonl_to_spark_scan(spark, tmp_path_factory):
    """The full S3 -> S1 path: collect via fake transport, write JSONL,
    scan with the declared schema, flatten to scrub-ready documents."""
    from incident_pii_redactor_spark.sources.incidents import (
        incidents_as_documents,
        read_incidents_jsonl,
    )

    pages = [[_incident(i) for i in range(3)]]
    c = IncidentCollector(_paged_transport(pages), sleep=lambda s: 0)
    rows = c.enrich_with_tasks(c.collect_incidents())
    path = str(tmp_path_factory.mktemp("collected") / "incidents.jsonl")
    assert save_jsonl(rows, path) == 3

    docs = incidents_as_documents(read_incidents_jsonl(spark, path))
    got = {r.incident_key: r.text for r in docs.collect()}
    assert set(got) == {"inc-000", "inc-001", "inc-002"}
    assert "alice@corpmail.com" in got["inc-000"]  # PII reaches the scrub


def test_limit_applies_on_final_page():
    """Review round 3: the limit must truncate even when it is reached
    on the last (or only) page - the pagination-exhausted break ran
    before the truncation."""
    pages = [[_incident(i) for i in range(10)]]
    c = IncidentCollector(_paged_transport(pages), sleep=lambda s: 0)
    got = c.collect_incidents(limit=5)
    assert [r["id"] for r in got] == [f"inc-{i:03d}" for i in range(5)]


# ---- Multi-platform orchestrator (reference data_collection_orchestrator.py)


def _fake_platform(n, prefix):
    return lambda: [_incident(i) | {"id": f"{prefix}-{i:03d}"}
                    for i in range(n)]


def _boom():
    raise TransportError("platform API is down")


def test_orchestrator_isolates_platform_failure(tmp_path):
    """Two platforms, one failing: the loop completes, the failure is a
    result row (not an exception), and the healthy platform's JSONL +
    the merged file + the summary sidecar all land (reference
    :95-158 semantics over N platforms)."""
    import json

    from incident_pii_redactor_spark.sources.collector import (
        CollectionOrchestrator,
    )

    orch = CollectionOrchestrator(
        {"alpha": _fake_platform(3, "alpha"), "beta": _boom},
        output_dir=str(tmp_path),
    )
    summary = orch.collect_from_all_platforms()
    assert summary.total_platforms == 2
    assert summary.successful_collections == 1
    assert summary.failed_collections == 1
    assert summary.total_incidents == 3
    by_platform = {r.platform: r for r in summary.collection_results}
    assert by_platform["beta"].success is False
    assert "down" in by_platform["beta"].error_message
    assert by_platform["alpha"].success is True

    # partial output preserved: alpha's file + the merged file exist
    merged = [json.loads(x) for x in
              open(summary.merged_file) if x.strip()]
    assert [r["id"] for r in merged] == [f"alpha-{i:03d}" for i in range(3)]
    assert all(r["platform"] == "alpha" for r in merged)
    sidecar = json.load(open(tmp_path / "collection_summary.json"))
    assert sidecar["failed_collections"] == 1
    assert sidecar["platform_results"][1]["platform"] == "beta"

    stats = orch.collection_statistics()
    assert stats["platforms_with_data"] == ["alpha"]
    assert stats["total_incidents"] == 3


def test_orchestrator_unknown_platform_and_merge_feeds_s1(
        tmp_path, spark):
    """Unknown platform -> failed result, never a KeyError; the merged
    JSONL is scannable by the S1 reader (full orchestrate -> scan
    path)."""
    from incident_pii_redactor_spark.sources.collector import (
        CollectionOrchestrator,
    )
    from incident_pii_redactor_spark.sources.incidents import (
        read_incidents_jsonl,
    )

    orch = CollectionOrchestrator(
        {"alpha": _fake_platform(2, "alpha"),
         "gamma": _fake_platform(1, "gamma")},
        output_dir=str(tmp_path),
    )
    bad = orch.collect_from_platform("nope")
    assert bad.success is False and "Unsupported" in bad.error_message

    summary = orch.collect_from_all_platforms()
    assert summary.successful_collections == 2
    got = {r.incident_id for r in
           read_incidents_jsonl(spark, summary.merged_file)
           .selectExpr("id as incident_id").collect()}
    assert got == {"alpha-000", "alpha-001", "gamma-000"}


def test_orchestrator_merge_preserves_platform_and_cleans_empty(tmp_path):
    """ADVICE round 4: the merge tag must not clobber a
    collector-provided 'platform' field, and a zero-row merge must not
    leave an empty all_incidents.jsonl behind while reporting
    merged_file=''."""
    import json
    import os

    from incident_pii_redactor_spark.sources.collector import (
        CollectionOrchestrator,
    )

    orch = CollectionOrchestrator(
        {"alpha": lambda: [
            {"id": "a-0", "platform": "upstream-system"},
            {"id": "a-1"},
        ]},
        output_dir=str(tmp_path / "one"),
    )
    summary = orch.collect_from_all_platforms()
    rows = {r["id"]: r for r in map(
        json.loads, open(summary.merged_file))}
    assert rows["a-0"]["platform"] == "upstream-system"  # preserved
    assert rows["a-1"]["platform"] == "alpha"            # tagged

    def boom():
        raise RuntimeError("api down")

    empty = CollectionOrchestrator(
        {"alpha": boom}, output_dir=str(tmp_path / "none"))
    summary = empty.collect_from_all_platforms()
    assert summary.merged_file == ""
    assert not os.path.exists(str(tmp_path / "none" / "all_incidents.jsonl"))
