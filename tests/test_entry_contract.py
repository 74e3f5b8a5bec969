"""Driver-contract smoke: entry() returns rows with a stable schema;
every queries() key has either an oracle or a documented omission."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert df.columns[0] == "doc_id"
    assert any(r.keep for r in rows) and any(not r.keep for r in rows)


def test_queries_all_callable(spark):
    qs = entrymod.queries()
    assert len(qs) == 50  # driver gate samples the FIRST 50 (round 4)
    for name in ("q1_pricing_summary", "doc_jaccard_verified_pairs",
                 "emb_ann_methods"):
        assert name in qs


def test_oracle_coverage():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs
    # every query carries an oracle (scrub_documents / emb_* via golden
    # fixtures, see FIXTURE_SF) EXCEPT the declared rows-only set
    # (engine-specific sketches with no DuckDB equivalent)
    assert qs - oracles == set(entrymod.ROWS_ONLY)
    assert set(entrymod.FIXTURE_SF) <= oracles


def test_scrub_fixture_is_fresh():
    """The golden fixture must match the CURRENT shared core — a stale
    fixture (generated before a detector change) would fail the driver
    gate. Recomputes the expected output and compares value-for-value."""
    import duckdb

    from incident_pii_redactor_spark.operators.scrub import _process_batch
    from incident_pii_redactor_spark.quality.scorer import DRIVER_DOCS

    fx = entrymod._FIXTURES + "/scrub_documents_sf0.01.parquet"
    pdf = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).df()
    out = _process_batch(pdf, "text", ("doc_id",), DRIVER_DOCS,
                         scrub_dropped=False)
    stored = duckdb.sql(f"SELECT * FROM read_parquet('{fx}')").df()
    assert len(out) == len(stored)
    assert (out["keep"].to_numpy() == stored["keep"].to_numpy()).all()
    assert (out["n_redactions"].to_numpy().astype("int64")
            == stored["n_redactions"].to_numpy()).all()
    live = ["" if v is None else v for v in out["text_scrubbed"].fillna("")]
    kept = ["" if v is None else v for v in stored["text_scrubbed"].fillna("")]
    assert live == kept, "stale fixture: regenerate with tools/make_fixtures.py"
