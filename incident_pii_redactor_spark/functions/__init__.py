"""Column-level helpers — JVM-side expressions (whole-stage codegen) with
DuckDB-SQL twins for the correctness oracle. UDF-free by design: these are
the hot-path text/dedup/similarity primitives that must never drop into
per-row Python (SURVEY.md §2.8)."""
