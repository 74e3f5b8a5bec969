"""Capture ``explain("formatted")`` for every declared query into
``plans/<tag>/<query>_<suffix>.txt`` (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters, Python-eval nodes — before
and after each optimization).

Usage:
    python tools/capture_plans.py r06 before [query ...]
    python tools/capture_plans.py r06 after  [query ...]

Runs in ONE JVM (plans are deterministic; timing is bench.py's job).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    import __spark_entry__ as entrymod
    from incident_pii_redactor_spark.plans import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("capture-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            txt = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {n_ex} Exchange, wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
