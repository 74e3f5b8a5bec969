"""incident_pii_redactor_spark — PySpark-native quality-filter + PII-scrub engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``kishorealliiita/incident-pii-redactor`` (a single-node
asyncio per-document pipeline): language identification, hashed n-gram
perplexity, Gopher/C4-style heuristic quality rules, and an arbitrated
regex PII scrub — all run as vectorized pandas/Arrow UDFs over
DataFrames, designed for 10^12-document Iceberg/Parquet tables.

Layout
------
core/       pure per-document functions (span model, detectors,
            arbitration, splice, validation) — shared verbatim by the
            Spark UDFs and the single-node oracle used in tests, which
            is what guarantees byte-identical output per url.
quality/    langid, perplexity, heuristic keep/drop rules (numpy).
functions/  Spark Column-level helpers (JVM-side expressions): text
            stats, dedup (exact / MinHash-LSH / SimHash), similarity.
operators/  DataFrame-level operators: the fused mapInPandas scrub
            stage, quality filter, manifest resume, salting.
sources/    input table readers + deterministic fixture synthesis.
plans/      SparkSession builders with scale-tuned configs.
streaming/  Structured Streaming wrapper over the same UDFs.
"""

__version__ = "0.1.0"
