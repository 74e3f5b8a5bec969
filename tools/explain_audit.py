"""Physical-plan audit over every __spark_entry__ query: counts exchanges,
join strategies, scan column width, pushed filters, and WholeStageCodegen
coverage. The '.explain until it's the plan you'd want' loop, automated.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def _count_struct_cols(s: str) -> int:
    """Count TOP-LEVEL fields of a struct<...> string (nested <>/() types
    contain commas and '>' that a flat regex miscounts)."""
    depth = 0
    cols = 0
    for ch in s[len("struct<"):]:
        if ch in "<(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == ">":
            if depth == 0:
                return cols + 1
            depth -= 1
        elif ch == "," and depth == 0:
            cols += 1
    return cols + 1


def audit(sf_dir: str) -> None:
    import __spark_entry__ as entrymod
    from incident_pii_redactor_spark.plans import build_session

    spark = build_session("plan-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':28s} {'exch':>4} {'bhj':>3} {'smj':>3} {'bnl':>3} "
          f"{'wscg':>4}  scans(cols) / pushed")
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        exch = len(re.findall(r"\bExchange\b", plan))
        bhj = len(re.findall(r"BroadcastHashJoin", plan))
        smj = len(re.findall(r"SortMergeJoin", plan))
        bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
        wscg = len(re.findall(r"WholeStageCodegen", plan))
        scans = []
        for m in re.finditer(r"ReadSchema: (struct<.*)", plan):
            scans.append(_count_struct_cols(m.group(1)))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        print(f"{name:28s} {exch:4d} {bhj:3d} {smj:3d} {bnl:3d} {wscg:4d}  "
              f"scans={scans} pushed={pushed}")
    spark.stop()


if __name__ == "__main__":
    audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
