"""Round benchmark: every driver query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
quality+scrub pass over a 200k-page synthetic web corpus (cached across
runs — generation is excluded from timings).

Round-3 harness (VERDICT round-2 item 2): per-FAMILY fresh-JVM timing,
best-of-N per query with every sample recorded. Round 2 timed all 50
queries once each inside one long-lived JVM, which made cross-round
diffs unfalsifiable on this 2-3x-noise shared host (the r01->r02
"doc_simhash regression" was unprovable either way). Now each query
family gets its own JVM (no cross-family JIT/GC/session-state bleed)
and each query runs BENCH_N (default 3) times; the JSON carries
``samples: {query: {best, n, all}}`` so later rounds can diff
best-vs-best with the spread visible.

Prints ONE COMPACT JSON line (round-5 fix, verdict item 6: the round
driver keeps only the LAST ~2000 chars of stdout, and the round-4 line
— 50 queries x per-sample arrays — overflowed that, leaving
``"parsed": null`` in BENCH_r04.json):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {headline query: best_sec, ...},
   "families": {family: total_best_sec, ...},
   "sf": <sf>, "scrub_docs_per_sec": N, "detail": "BENCH/last_run.json"}
The FULL payload (every query, every sample) goes to
``BENCH/last_run.json``; the printed line carries the headline
queries + per-family totals and stays well under the capture window.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("BENCH_PAGES_N", "200000"))
BENCH_N = int(os.environ.get("BENCH_N", "3"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")

_DEDUP_KEYS = ("minhash", "jaccard", "simhash", "winnow", "exact_dup",
               "kmv", "boilerplate")


def family_of(name: str) -> str:
    """Stable query -> JVM-family assignment (one fresh JVM per family)."""
    if name == "scrub_documents":
        return "scrub"
    if name.startswith("emb_"):
        return "emb"
    if name.startswith("doc_") and any(k in name for k in _DEDUP_KEYS):
        return "dedup"
    if name.startswith("doc_"):
        return "doctext"
    if name.startswith("events"):
        return "events"
    if name[0] == "q" and name[1].isdigit():
        return "tpch"
    return "sql"


def pages_path(n_shards: int = 32, size_mult: int = 1, rows: int | None = None) -> str:
    """Corpus as n_shards parquet files: scan parallelism comes from the
    source layout (as it would from HDFS/S3 file splits at real scale),
    not from a repartition shuffle."""
    os.makedirs(CACHE, exist_ok=True)
    rows = rows or PAGES_N
    path = os.path.join(CACHE, f"pages_{rows}_m{size_mult}_sharded")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from incident_pii_redactor_spark.sources.pages import synth_pages

        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pdf = synth_pages(rows, size_mult=size_mult)
        schema = pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        )
        per = (rows + n_shards - 1) // n_shards
        for i in range(n_shards):
            shard = pdf.iloc[i * per: (i + 1) * per]
            pq.write_table(
                pa.Table.from_pandas(shard, schema=schema, preserve_index=False),
                f"{tmp}/part-{i:03d}.parquet",
            )
        os.rename(tmp, path)
    return path


def warc_path(pages_parquet_dir: str, rows: int, n_shards: int = 32) -> str:
    """Materialize the cached page corpus as n_shards per-record-gzip
    WARC files (the CC layout) — generation cached and excluded from
    timings, like pages_path."""
    path = os.path.join(CACHE, f"warc_{rows}_sharded")
    if not os.path.exists(path):
        import pyarrow.parquet as pq

        from incident_pii_redactor_spark.sources.warc import write_warc

        pdf = pq.read_table(pages_parquet_dir).to_pandas()
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        per = (len(pdf) + n_shards - 1) // n_shards
        for i in range(n_shards):
            shard = pdf.iloc[i * per:(i + 1) * per]
            write_warc(f"{tmp}/part-{i:03d}.warc.gz", shard)
        os.rename(tmp, path)
    return path


def _fresh_session():
    from incident_pii_redactor_spark.plans import build_session

    spark = build_session("bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM and start the Python worker pool once (excluded from
    # timings — we measure steady-state throughput, not process cold start)
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    warm = spark.range(CPUS * 4).repartition(CPUS)
    warm.mapInPandas(lambda it: it, "id long").count()
    return spark


def run_family(fam: str) -> None:
    """Child-process entry: time this family's queries in a fresh JVM,
    best-of-BENCH_N each, print one JSON line."""
    import __spark_entry__ as entrymod

    spark = _fresh_session()
    samples: dict[str, dict] = {}
    extra: dict[str, float] = {}

    if fam == "pages":
        from incident_pii_redactor_spark.operators import quality_scrub

        ppath = pages_path()
        large_rows = max(PAGES_N // 10, 1000)
        lpath = pages_path(size_mult=6, rows=large_rows)  # ~4 KB/doc
        pages = spark.read.parquet(ppath)
        all_t = []
        n_rows = 0
        for _ in range(3):  # host swings 2-5x between identical passes
            t0 = time.time()
            n_rows = quality_scrub(pages).count()
            all_t.append(round(time.time() - t0, 3))
        samples[f"scrub_pages_{PAGES_N // 1000}k"] = {
            "best": min(all_t), "n": len(all_t), "all": all_t}
        extra["scrub_docs_per_sec"] = round(n_rows / min(all_t), 1)
        extra["scrub_rows"] = n_rows

        large = spark.read.parquet(lpath)
        n_large = large.count()
        large_bytes = large.selectExpr("sum(octet_length(text))").head()[0]
        all_t = []
        for _ in range(3):
            t0 = time.time()
            quality_scrub(large).count()
            all_t.append(round(time.time() - t0, 3))
        samples["scrub_pages_4kb"] = {
            "best": min(all_t), "n": len(all_t), "all": all_t}
        extra["scrub_4kb_docs_per_sec"] = round(n_large / min(all_t), 1)
        extra["scrub_4kb_mb_per_sec"] = round(
            large_bytes / 1e6 / min(all_t), 1)

        # WARC ingestion throughput: parse the 4 KB corpus from the CC
        # per-record-gzip layout (32 shard files -> 32 tasks)
        from incident_pii_redactor_spark.sources.warc import read_warc

        wdir = warc_path(lpath, rows=large_rows)
        warc_bytes = sum(
            os.path.getsize(os.path.join(wdir, f))
            for f in os.listdir(wdir))
        all_t = []
        for _ in range(3):
            t0 = time.time()
            n_warc = read_warc(spark, wdir + "/*.warc.gz").count()
            all_t.append(round(time.time() - t0, 3))
        assert n_warc == n_large, (n_warc, n_large)
        samples["warc_parse_4kb"] = {
            "best": min(all_t), "n": len(all_t), "all": all_t}
        extra["warc_parse_docs_per_sec"] = round(n_large / min(all_t), 1)
        extra["warc_parse_mb_per_sec"] = round(
            warc_bytes / 1e6 / min(all_t), 1)
    else:
        qs = entrymod.queries()
        for name in qs:
            if family_of(name) != fam:
                continue
            all_t = []
            for _ in range(BENCH_N):
                t0 = time.time()
                qs[name](spark, SF_DIR).count()
                all_t.append(round(time.time() - t0, 3))
            samples[name] = {"best": min(all_t), "n": len(all_t),
                             "all": all_t}

    print(json.dumps({"family": fam, "samples": samples, "extra": extra}))
    spark.stop()


def main() -> None:
    import __spark_entry__ as entrymod

    if PAGES_N >= 100000:  # generate corpora once, outside any timing
        pages_path()
        pages_path(size_mult=6, rows=max(PAGES_N // 10, 1000))

    fams: list[str] = []
    for name in entrymod.queries():
        f = family_of(name)
        if f not in fams:
            fams.append(f)
    fams.append("pages")

    samples: dict[str, dict] = {}
    extra: dict[str, float] = {}
    here = os.path.abspath(__file__)
    for fam in fams:
        out = subprocess.run(
            [sys.executable, here, "--family", fam],
            capture_output=True, text=True, env=os.environ,
        )
        line = next(
            (ln for ln in reversed(out.stdout.splitlines())
             if ln.startswith("{")), None)
        if out.returncode != 0 or line is None:
            print(f"family {fam} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        got = json.loads(line)
        samples.update(got["samples"])
        extra.update(got["extra"])

    timings = {name: s["best"] for name, s in samples.items()}
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "sf": sf,
        **extra,
        "cpus": CPUS,
        "bench_n": BENCH_N,
        "fresh_jvm_per_family": True,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH",
        "last_run.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(full, f, indent=1)

    fam_total = {}
    for name, t in timings.items():
        fam = family_of(name) \
            if not name.startswith(("scrub_pages", "warc_parse")) \
            else "pages"
        fam_total[fam] = round(fam_total.get(fam, 0.0) + t, 3)
    headline = {
        n: timings[n] for n in (
            "scrub_documents", "scrub_pages_200k", "scrub_pages_4kb",
            "warc_parse_4kb",
            "doc_dedup_sketches", "doc_neardup_clusters",
            "emb_near_dup_pairs_lsh", "emb_semdedup",
            "doc_top_terms_tfidf", "q1_pricing_summary",
            "events_hypertable_rollup",
        ) if n in timings
    }
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "families": fam_total,
        "sf": sf,
        **extra,
        "cpus": CPUS,
        "bench_n": BENCH_N,
        "n_queries": len(timings),
        "detail": "BENCH/last_run.json",
    }, separators=(",", ":")))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--family":
        run_family(sys.argv[2])
    else:
        main()
