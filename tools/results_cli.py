"""Results query CLI — the engine's equivalent of the reference's
``db_cli.py`` / ``src/database/incident_db.py:28-123`` search surface
("show me processing results for incident X"), over the scrub job's
open-format outputs (``jobs/scrub.py`` parquet + manifest) instead of a
SQLite file.

Read-only inspection runs on DuckDB, not Spark: sub-second startup vs
an ~8 s JVM, and the point of parquet outputs is exactly that any engine
can query them. (The processing itself is the Spark job.)

Subcommands (reference command in parentheses):
  get         one document's processing result by url (db_cli get)
  list        recent results, --kept/--dropped filters (db_cli list)
  unprocessed input pages missing from the output (list --unprocessed)
  stats       corpus-level counters + manifest progress (db_cli stats)

Usage:
  python tools/results_cli.py get --output /data/out --url https://h/1
  python tools/results_cli.py list --output /data/out --dropped --limit 5
  python tools/results_cli.py unprocessed --input /data/pages --output /data/out
  python tools/results_cli.py stats --output /data/out [--manifest /data/mf]
"""

from __future__ import annotations

import argparse
import json
import sys

import duckdb


def _parquet_pattern(path: str) -> str:
    """Directory inputs (the normal job layout) need a recursive glob;
    a bare file path passes through."""
    import os

    return f"{path}/**/*.parquet" if os.path.isdir(path) else path


def _sq(path: str) -> str:
    """SQL-string-escape an interpolated path (ADVICE round 2: a quote
    in a path broke the query; values use parameter binding, but view
    DDL and read_parquet globs must be literals)."""
    return path.replace("'", "''")


def _out(con: duckdb.DuckDBPyConnection, output: str) -> None:
    con.sql(
        f"CREATE VIEW results AS SELECT * FROM read_parquet("
        f"'{_sq(_parquet_pattern(output))}', hive_partitioning=true)"
    )


def cmd_get(args) -> int:
    con = duckdb.connect()
    _out(con, args.output)
    op = "LIKE" if args.like else "="
    pat = f"%{args.url}%" if args.like else args.url
    rows = con.sql(
        f"SELECT * FROM results WHERE url {op} ? ORDER BY url LIMIT 20",
        params=[pat],
    )
    got = rows.fetchall()
    if not got:
        print(f"no result for url {args.url!r}")
        return 1
    cols = rows.columns
    for r in got:
        d = dict(zip(cols, r))
        if not args.full and d.get("text_scrubbed"):
            d["text_scrubbed"] = d["text_scrubbed"][:200] + (
                "..." if len(d["text_scrubbed"]) > 200 else "")
        d.pop("rule_flags", None)
        print(json.dumps({k: v for k, v in d.items()}, default=str, indent=2))
    return 0


def cmd_list(args) -> int:
    con = duckdb.connect()
    _out(con, args.output)
    where = "TRUE"
    if args.kept:
        where = "keep"
    elif args.dropped:
        where = "NOT keep"
    rows = con.sql(
        f"SELECT url, keep, drop_reason, n_redactions, residual_pii, "
        f"quality_score FROM results WHERE {where} ORDER BY url LIMIT ?",
        params=[int(args.limit)],
    ).fetchall()
    for r in rows:
        print(json.dumps(
            dict(zip(["url", "keep", "drop_reason", "n_redactions",
                      "residual_pii", "quality_score"], r)), default=str))
    return 0


def cmd_unprocessed(args) -> int:
    """Pages present in the input but absent from the output — the
    reference's get_incidents_without_processing (incident_db.py:234)."""
    con = duckdb.connect()
    _out(con, args.output)
    rows = con.sql(
        f"SELECT p.url FROM read_parquet('{_sq(_parquet_pattern(args.input))}') p "
        f"WHERE NOT EXISTS (SELECT 1 FROM results r WHERE r.url = p.url) "
        f"ORDER BY p.url LIMIT ?",
        params=[int(args.limit)],
    ).fetchall()
    for (url,) in rows:
        print(url)
    print(f"-- {len(rows)} shown (limit {args.limit})", file=sys.stderr)
    return 0


def cmd_stats(args) -> int:
    """Corpus counters (reference get_processing_stats,
    incident_db.py:283) + per-run manifest progress."""
    con = duckdb.connect()
    _out(con, args.output)
    s = con.sql("""
        SELECT COUNT(*) AS docs,
               SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS kept,
               SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS dropped,
               CAST(SUM(n_redactions) AS BIGINT) AS total_redactions,
               CAST(SUM(residual_pii) AS BIGINT) AS residual_pii,
               ROUND(AVG(quality_score), 4) AS avg_quality
        FROM results
    """).fetchone()
    out = dict(zip(["docs", "kept", "dropped", "total_redactions",
                    "residual_pii", "avg_quality"], s))
    reasons = con.sql(
        "SELECT drop_reason, COUNT(*) FROM results WHERE NOT keep "
        "GROUP BY 1 ORDER BY 2 DESC"
    ).fetchall()
    out["drop_reasons"] = {k: v for k, v in reasons}
    if args.manifest:
        m = con.sql(
            f"SELECT run_id, COUNT(DISTINCT partition_id) AS buckets, "
            f"CAST(SUM(rows_in) AS BIGINT) AS rows FROM "
            f"read_parquet('{_sq(_parquet_pattern(args.manifest))}') "
            f"GROUP BY run_id ORDER BY run_id"
        ).fetchall()
        out["manifest_runs"] = [
            dict(zip(["run_id", "buckets", "rows"], r)) for r in m
        ]
    print(json.dumps(out, default=str, indent=2))
    return 0


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("get", help="one document's processing result")
    g.add_argument("--output", required=True)
    g.add_argument("--url", required=True)
    g.add_argument("--like", action="store_true",
                   help="substring match instead of exact url")
    g.add_argument("--full", action="store_true",
                   help="print full scrubbed text, not a 200-char preview")
    g.set_defaults(fn=cmd_get)

    l = sub.add_parser("list", help="recent results")
    l.add_argument("--output", required=True)
    l.add_argument("--limit", type=int, default=10)
    l.add_argument("--kept", action="store_true")
    l.add_argument("--dropped", action="store_true")
    l.set_defaults(fn=cmd_list)

    u = sub.add_parser("unprocessed", help="input pages missing from output")
    u.add_argument("--input", required=True)
    u.add_argument("--output", required=True)
    u.add_argument("--limit", type=int, default=100)
    u.set_defaults(fn=cmd_unprocessed)

    s = sub.add_parser("stats", help="corpus counters + manifest progress")
    s.add_argument("--output", required=True)
    s.add_argument("--manifest", default=None)
    s.set_defaults(fn=cmd_stats)
    return p.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    sys.exit(args.fn(args))
