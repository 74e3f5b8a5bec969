"""Production scrub job: resumable quality-filter + PII-scrub over a pages table.

Usage (local test; on a cluster swap --master / add --py-files engine.zip):

    spark-submit --py-files engine.zip jobs/scrub.py \
        --input  /data/pages_parquet \
        --output /data/pages_scrubbed \
        --manifest /data/pages_scrubbed__manifest \
        --run-id run1 --n-buckets 64 --bucket-group-size 8 \
        --completed-ts 2025-01-01T00:00:00

Execution model (SURVEY.md §3.4):
  read input -> content-derived bucket ids -> broadcast ANTI JOIN vs the
  manifest's completed buckets (resume) -> loop over bucket GROUPS: one
  narrow mapInPandas scrub pass per group, output written partitioned by
  bucket, one manifest row appended per completed bucket. A crash loses at
  most one in-flight group; restart skips everything manifested. Output is
  byte-identical to a cold run because every per-row value is a pure
  function of the row (md5 pseudonyms, no wall clock — completed_ts is a
  job ARG, FIXTURES.md F4).

Scale notes: the scrub itself is shuffle-free; the only shuffles are the
per-bucket metric rollups (tiny) and the optional salted repartition for
skewed inputs (--salt on). html:binary is pruned at the parquet scan
because the operator selects only (url, text).
"""

from __future__ import annotations

import os
import sys

# allow direct `python jobs/scrub.py` from the repo root (the
# documented CLI surface): the script dir is jobs/, so the package
# root one level up must be importable without PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys

from pyspark.sql import functions as F

from incident_pii_redactor_spark.operators.resume import (
    BUCKET_COL,
    completed_buckets,
    manifest_rows_from_output,
    pending,
    read_manifest,
    with_bucket,
)
from incident_pii_redactor_spark.operators.salting import salted_repartition
from incident_pii_redactor_spark.sources.catalog import read_pages
from incident_pii_redactor_spark.operators.scrub import quality_scrub
from incident_pii_redactor_spark.plans import build_session
from incident_pii_redactor_spark.quality.scorer import WEB_DEFAULT


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet path or iceberg:<catalog.db.table>")
    p.add_argument("--output", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--run-id", default="run1")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--bucket-group-size", type=int, default=8)
    p.add_argument("--completed-ts", default="2025-01-01T00:00:00")
    p.add_argument("--from-html", action="store_true",
                   help="derive text = extract_text(html) instead of the "
                        "pre-extracted text column (functions/html.py; "
                        "the raw-crawl ingestion path)")
    p.add_argument("--from-warc", action="store_true",
                   help="--input is WARC/WET crawl files (glob ok), not a "
                        "pages table: sources/warc.py streams records one "
                        "task per file (WARC is unsplittable). Response "
                        "records get text = extract_text(html); WET "
                        "conversion records keep their extracted text")
    p.add_argument("--c4-line-filter", action="store_true",
                   help="apply C4 line-level cleaning (Raffel et al. "
                        "2020: terminal punctuation, >=5 words, no "
                        "javascript boilerplate) and drop pages failing "
                        "the C4 page rules (lorem ipsum / code braces / "
                        "<3 sentences) BEFORE quality scoring. Pure "
                        "Catalyst narrow map — no shuffle added")
    p.add_argument("--salt", action="store_true",
                   help="salted repartition on url before scrubbing")
    p.add_argument("--num-partitions", type=int, default=0,
                   help="target partitions for --salt (0 = default parallelism)")
    p.add_argument("--master", default=None)
    p.add_argument("--ignore-corrupt-files", action="store_true",
                   help="skip unreadable input files instead of failing "
                        "the job (spark.sql.files.ignoreCorruptFiles): at "
                        "crawl scale some shards WILL have truncated "
                        "footers, and one of ~800k files must not kill a "
                        "resume-capable run. Default off — silent data "
                        "loss should be an explicit operator decision")
    p.add_argument("--fail-after-groups", type=int, default=0,
                   help="TESTING ONLY: exit(1) after N completed groups")
    return p.parse_args(argv)


def run(args, spark=None) -> dict:
    owns_session = spark is None
    if owns_session:
        spark = build_session("pii-scrub-job", master=args.master)
    _corrupt_key = "spark.sql.files.ignoreCorruptFiles"
    _corrupt_old = spark.conf.get(_corrupt_key)
    if args.ignore_corrupt_files:
        spark.conf.set(_corrupt_key, "true")
    try:
        if args.from_warc and args.from_html:
            # --from-warc already extracts text for response records
            # while PRESERVING WET records' extracted text; a blanket
            # --from-html re-extraction would overwrite WET text with
            # extract_text(NULL html) = NULL — silent data loss
            # (review round 5)
            raise SystemExit(
                "--from-warc and --from-html are mutually exclusive: "
                "the WARC path already extracts text from response "
                "records and keeps WET conversion text")
        if args.from_warc:
            from incident_pii_redactor_spark.functions.html import extract_text
            from incident_pii_redactor_spark.sources.warc import read_warc

            df = read_warc(spark, args.input)
            # response records arrive text-NULL (html only); WET
            # conversion records arrive with extracted text. coalesce
            # fills exactly the former, so mixed WARC+WET globs work
            df = df.withColumn(
                "text", F.coalesce("text", extract_text("html")))
        else:
            df = read_pages(spark, args.input)
        if args.from_html:
            from incident_pii_redactor_spark.functions.html import extract_text

            # NOTE: this re-materializes text from html, so the scrub
            # operator's html-column pruning no longer applies to this
            # run — the scan must read html by definition of the path
            df = df.withColumn("text", extract_text("html"))
        if args.c4_line_filter:
            from incident_pii_redactor_spark.functions.text import (
                c4_page_keep,
                clean_lines_c4,
            )

            cleaned = clean_lines_c4("text")
            df = (df.filter(c4_page_keep("text", cleaned=cleaned))
                    .withColumn("text", cleaned))
        df = with_bucket(df, "url", args.n_buckets)
        manifest = read_manifest(spark, args.manifest)
        todo = pending(df, manifest, args.run_id)

        done = set(completed_buckets(manifest, args.run_id))
        remaining = sorted(set(range(args.n_buckets)) - done)
        groups = [
            remaining[i: i + args.bucket_group_size]
            for i in range(0, len(remaining), args.bucket_group_size)
        ]
        stats = {"groups_run": 0, "buckets_done": len(done), "rows": 0}
        for gi, group in enumerate(groups):
            chunk = todo.filter(F.col(BUCKET_COL).isin(group))
            if args.salt:
                nparts = args.num_partitions or spark.sparkContext.defaultParallelism
                chunk = salted_repartition(chunk, "url", nparts)
            out = quality_scrub(
                chunk, id_cols=("url", "warc_ts", "lang", BUCKET_COL),
                cfg=WEB_DEFAULT,
            )
            out = out.persist()
            n = out.count()
            # dynamic partition OVERWRITE (not append): re-running a group
            # after a crash-between-output-and-manifest replaces the same
            # bucket partitions instead of duplicating them — the write is
            # idempotent per bucket, which is what makes resume exact
            out.write.mode("overwrite").partitionBy(BUCKET_COL) \
                .option("partitionOverwriteMode", "dynamic") \
                .parquet(args.output)
            manifest_rows_from_output(out, args.run_id, args.completed_ts) \
                .write.mode("append").parquet(args.manifest)
            out.unpersist()
            stats["groups_run"] += 1
            stats["buckets_done"] += len(group)
            stats["rows"] += n
            if args.fail_after_groups and stats["groups_run"] >= args.fail_after_groups:
                sys.exit(1)
        return stats
    finally:
        if owns_session:
            spark.stop()
        else:
            spark.conf.set(_corrupt_key, _corrupt_old)  # reused session


if __name__ == "__main__":
    print(run(parse_args()))
