"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same sf dir; compare row count, column names, and an
order-insensitive value hash (values normalized: Decimal -> str, floats
-> repr(round(12)), timestamps -> isoformat).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import datetime as dt
import hashlib
import sys
import time

import duckdb

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, float):
        return repr(round(v, 12))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def row_keys(rows, colnames) -> list:
    # case-INSENSITIVE column alignment, matching the schema compare
    order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def value_hash(rows, colnames) -> str:
    return hashlib.md5("\n".join(row_keys(rows, colnames)).encode("utf-8")).hexdigest()


def main(sf_dir: str, only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from incident_pii_redactor_spark.plans import build_session

    spark = build_session("correctness", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = [q for q in only if q not in qs]
    if unknown:
        print(f"ERROR: unknown queries {unknown}; known: {sorted(qs)}")
        return 1
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            orel = con.sql(oracles[name])
            orows = orel.fetchall()
            ocols = orel.columns
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh = value_hash([tuple(r) for r in srows], scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                skey = row_keys([tuple(r) for r in srows], scols)
                okey = row_keys(orows, ocols)
                for a, b in zip(skey, okey):
                    if a != b:
                        print(f"  spark:  {a[:200]}")
                        print(f"  oracle: {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    return failures


if __name__ == "__main__":
    import os

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = [a for a in args if not os.path.isdir(a)]
    sys.exit(1 if main(sf, only) else 0)
