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
    assert len(qs) >= 20
    for name in ("q1_pricing_summary", "doc_minhash_pairs", "emb_cosine_topk"):
        assert name in qs


def test_oracle_coverage():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs
    # documented rows-only set — everything else must carry an oracle
    assert qs - oracles == {"scrub_documents", "emb_lsh_ann"}
