"""Partition-granular resume (FIXTURES.md F4 spec): kill after k groups,
rerun, output must be byte-identical to a cold full run with no
re-scrubbing of manifested buckets."""

import pandas as pd
import pytest

from jobs.scrub import parse_args, run


def _read_all(spark, path):
    return (
        spark.read.parquet(path)
        .select("url", "keep", "text_scrubbed")
        .toPandas()
        .set_index("url")
        .sort_index()
    )


@pytest.fixture(scope="module")
def cold_run(spark, pages_parquet, tmp_path_factory):
    d = tmp_path_factory.mktemp("cold")
    args = parse_args(
        ["--input", pages_parquet, "--output", str(d / "out"),
         "--manifest", str(d / "mf"), "--n-buckets", "8",
         "--bucket-group-size", "8"]
    )
    stats = run(args, spark=spark)
    assert stats["buckets_done"] == 8
    return _read_all(spark, str(d / "out"))


def test_interrupted_then_resumed_equals_cold(spark, pages_parquet,
                                              tmp_path_factory, cold_run):
    d = tmp_path_factory.mktemp("warm")
    base = ["--input", pages_parquet, "--output", str(d / "out"),
            "--manifest", str(d / "mf"), "--n-buckets", "8",
            "--bucket-group-size", "2"]
    # first attempt dies after 2 of 4 groups
    with pytest.raises(SystemExit):
        run(parse_args(base + ["--fail-after-groups", "2"]), spark=spark)
    manifest = spark.read.parquet(str(d / "mf"))
    assert manifest.select("partition_id").distinct().count() == 4
    # resume: must process exactly the remaining 4 buckets
    stats = run(parse_args(base), spark=spark)
    assert stats["groups_run"] == 2
    assert stats["buckets_done"] == 8
    warm = _read_all(spark, str(d / "out"))
    pd.testing.assert_frame_equal(warm, cold_run)


def test_rerun_when_complete_is_noop(spark, pages_parquet, tmp_path_factory):
    d = tmp_path_factory.mktemp("noop")
    base = ["--input", pages_parquet, "--output", str(d / "out"),
            "--manifest", str(d / "mf"), "--n-buckets", "4",
            "--bucket-group-size", "4"]
    run(parse_args(base), spark=spark)
    stats = run(parse_args(base), spark=spark)
    assert stats["groups_run"] == 0 and stats["rows"] == 0


def test_manifest_lineage_counters(spark, pages_parquet, tmp_path_factory):
    d = tmp_path_factory.mktemp("lineage")
    run(parse_args(
        ["--input", pages_parquet, "--output", str(d / "out"),
         "--manifest", str(d / "mf"), "--n-buckets", "4",
         "--bucket-group-size", "4"]), spark=spark)
    m = spark.read.parquet(str(d / "mf")).toPandas()
    assert m["rows_in"].sum() == 2000
    assert (m["rows_kept"] + m["rows_dropped"] == m["rows_in"]).all()
    assert m["input_fingerprint"].notna().all()
    reds = {}
    for d_ in m["redactions_by_type"]:
        for k, v in (d_ or {}).items():
            reds[k] = reds.get(k, 0) + v
    assert reds.get("email", 0) > 100  # every kept pii doc has 2 emails


def test_dedup_job_end_to_end(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt
    import pandas as pd

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("dedup")
    ts = dt.datetime(2025, 1, 1)
    base = ("the quick brown fox jumps over the lazy dog and runs through "
            "the field while the sun rises slowly over the quiet hills")
    rows = [
        ("https://a/1", ts, b"", base, "en"),
        ("https://a/2", ts, b"", base, "en"),                     # exact dup
        ("https://a/3", ts, b"", base.replace("quiet", "green"), "en"),  # near dup
        ("https://a/4", ts, b"", "utterly different content about parquet "
                                 "files shuffles and broadcast joins today", "en"),
    ]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "both"]), spark=spark)
    assert stats["rows_in"] == 4
    assert stats["rows_after_exact"] == 3   # exact dup gone
    urls = {r.url for r in spark.read.parquet(str(d / "out")).collect()}
    assert "https://a/1" in urls and "https://a/4" in urls
    assert "https://a/2" not in urls        # exact dup dropped
    assert "https://a/3" not in urls        # near dup dropped (min-url wins)


def test_dedup_exact_mode_keeps_null_text_rows(spark, tmp_path_factory):
    """ADVICE round 5: md5(NULL) is NULL and a plain equi semi-join on a
    NULL key matches nothing, so exact mode silently dropped every
    NULL-text row (legitimate input: jobs/ingest.py writes response
    records pre-extraction). NULL-text rows must pass through exact
    dedup unchanged — neither dropped nor collapsed to one keeper."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("dedup_null_text")
    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("https://a/1", ts, b"", "shared content body one", "en"),
        ("https://a/2", ts, b"", "shared content body one", "en"),  # dup
        ("https://a/3", ts, b"", None, "en"),   # pre-extraction page
        ("https://a/4", ts, b"", None, "en"),   # another one
    ]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "exact"]), spark=spark)
    assert stats["rows_after_exact"] == 3  # one dup gone, both NULLs kept
    urls = {r.url for r in spark.read.parquet(str(d / "out")).collect()}
    assert urls == {"https://a/1", "https://a/3", "https://a/4"}


def test_dedup_input_scans_once_per_stage(spark, tmp_path_factory,
                                          monkeypatch):
    """Round-4 verdict: per-stage ``stats[...] = df.count()`` with no
    persist replayed the whole input lineage ~6x. The fix persists each
    stage before counting, so the INPUT scan must execute exactly once
    for the whole job. Instrumented by wrapping read_pages with a
    row-counting accumulator: rows observed == rows_in proves one scan
    (the un-persisted job would observe a multiple of it)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import jobs.dedup as dmod
    from incident_pii_redactor_spark.sources.catalog import read_pages

    d = tmp_path_factory.mktemp("dedup_scans")
    ts = dt.datetime(2025, 1, 1)
    rows = [(f"https://s/{i}", ts, b"", f"unique document body {i} "
             f"with several words of filler text {i}", "en")
            for i in range(8)]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))

    acc = spark.sparkContext.accumulator(0)

    def counting_read(sp, path):
        real = read_pages(sp, path)

        def tap(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return real.mapInPandas(tap, real.schema)

    monkeypatch.setattr(dmod, "read_pages", counting_read)
    stats = dmod.run(dmod.parse_args(
        ["--input", str(d / "pages.parquet"),
         "--output", str(d / "out"), "--mode", "both",
         "--url-canonical"]), spark=spark)
    assert stats["rows_in"] == 8
    assert acc.value == 8, (
        f"input scanned {acc.value / 8:.1f}x — a stage count is "
        "replaying lineage instead of reading the stage cache")

    # opt-out path: zero stage counts, zero persists — stats carries
    # only the written-output count
    acc2 = spark.sparkContext.accumulator(0)

    def counting_read2(sp, path):
        real = read_pages(sp, path)

        def tap(it):
            for pdf in it:
                acc2.add(len(pdf))
                yield pdf

        return real.mapInPandas(tap, real.schema)

    monkeypatch.setattr(dmod, "read_pages", counting_read2)
    stats2 = dmod.run(dmod.parse_args(
        ["--input", str(d / "pages.parquet"),
         "--output", str(d / "out2"), "--mode", "exact",
         "--no-stage-counts"]), spark=spark)
    assert set(stats2) == {"rows_out"}
    assert stats2["rows_out"] == 8


def test_dedup_drop_list_is_not_force_broadcast(spark):
    """Round-4 verdict weak item: the near-dup drop list is UNBOUNDED
    (20-40% of a web corpus), so the anti-join must not carry a
    broadcast hint — AQE may still choose a broadcast when the list
    measures small, but a ResolvedHint in the logical plan forces it
    at any size."""
    import datetime as dt

    from jobs.dedup import near_dedup, parse_args as dargs

    df = spark.createDataFrame(
        [("https://a/1", dt.datetime(2025, 1, 1), bytearray(b""),
          "some words repeated enough to shingle properly here", "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    out = near_dedup(df, dargs(["--input", "x", "--output", "y"]))
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, (
        "forced broadcast hint in the near-dedup anti join")


def test_crash_between_write_and_manifest_is_idempotent(spark, pages_parquet,
                                                        tmp_path_factory):
    """Simulate the worst crash window: output for a bucket group was
    written but its manifest rows were not. The rerun must OVERWRITE those
    bucket partitions (dynamic partition overwrite), not duplicate them."""
    import pyspark.sql.functions as F

    d = tmp_path_factory.mktemp("crashwin")
    base = ["--input", pages_parquet, "--output", str(d / "out"),
            "--manifest", str(d / "mf"), "--n-buckets", "4",
            "--bucket-group-size", "2"]
    run(parse_args(base), spark=spark)
    full = _read_all(spark, str(d / "out"))

    # drop the manifest rows of the second group -> looks like the crash
    mf = spark.read.parquet(str(d / "mf")).toPandas()
    surviving = mf[mf.partition_id < 2]
    import shutil
    shutil.rmtree(str(d / "mf"))
    spark.createDataFrame(surviving).write.parquet(str(d / "mf"))

    stats = run(parse_args(base), spark=spark)
    assert stats["groups_run"] == 1  # only the unmanifested group re-ran
    again = _read_all(spark, str(d / "out"))
    assert len(again) == len(full)  # no duplicated rows
    import pandas as pd
    pd.testing.assert_frame_equal(again, full)


def test_dedup_job_jaccard_verification_kills_lsh_fps(spark, tmp_path_factory):
    """ADVICE round 1: raw LSH candidates must not be treated as confirmed
    duplicates. This pair shares one minhash band (verified offline with
    the exact signature formula) but has n-gram Jaccard ~0.31 — the
    verified path must RETAIN both docs; --no-verify-jaccard drops one."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("dedup_fp")
    ts = dt.datetime(2025, 1, 1)
    common = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon")
    tail_a = " ".join(f"worda0x{i}" for i in range(20))
    tail_b = " ".join(f"wordb0y{i}" for i in range(20))
    rows = [("https://a/1", ts, b"", f"{common} {tail_a}", "en"),
            ("https://a/2", ts, b"", f"{common} {tail_b}", "en")]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))

    base = ["--input", str(d / "pages.parquet"), "--mode", "near"]
    verified = dedup_run(dedup_args(
        base + ["--output", str(d / "out_v")]), spark=spark)
    assert verified["rows_after_near"] == 2  # FP candidate retained

    raw = dedup_run(dedup_args(
        base + ["--output", str(d / "out_raw"), "--no-verify-jaccard"]),
        spark=spark)
    assert raw["rows_after_near"] == 1  # unverified path drops the FP


def test_results_cli_surface(spark, pages_parquet, tmp_path_factory, capsys):
    """tools/results_cli.py = the reference's db_cli query surface
    (get / list / unprocessed / stats) over the job's parquet+manifest."""
    import json
    import sys

    sys.path.insert(0, "tools")
    from results_cli import parse_args as cli_args

    d = tmp_path_factory.mktemp("rescli")
    run(parse_args(["--input", pages_parquet, "--output", str(d / "out"),
                    "--manifest", str(d / "mf"), "--n-buckets", "4",
                    "--bucket-group-size", "4"]), spark=spark)
    some_url = spark.read.parquet(str(d / "out")).select("url").head()[0]

    a = cli_args(["get", "--output", str(d / "out"), "--url", some_url])
    assert a.fn(a) == 0
    out = capsys.readouterr().out
    assert some_url in out and '"keep"' in out

    a = cli_args(["list", "--output", str(d / "out"), "--dropped",
                  "--limit", "3"])
    assert a.fn(a) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert lines and all(not r["keep"] for r in lines)

    a = cli_args(["unprocessed", "--input", pages_parquet,
                  "--output", str(d / "out")])
    assert a.fn(a) == 0
    assert capsys.readouterr().out.strip() == ""  # full run: nothing pending

    a = cli_args(["stats", "--output", str(d / "out"),
                  "--manifest", str(d / "mf")])
    assert a.fn(a) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["docs"] == 2000
    assert stats["kept"] + stats["dropped"] == 2000
    assert stats["manifest_runs"][0]["buckets"] == 4

    a = cli_args(["get", "--output", str(d / "out"), "--url", "nope://x"])
    assert a.fn(a) == 1  # not found -> nonzero exit


def test_scrub_job_ignore_corrupt_files(spark, tmp_path_factory):
    """At crawl scale some shards have truncated footers. Default:
    a corrupt file fails the job loudly. --ignore-corrupt-files: the
    good shards process, the garbage shard is skipped."""
    from incident_pii_redactor_spark.sources.pages import (
        write_pages_parquet,
    )
    from jobs.scrub import parse_args as jargs, run as jrun

    d = tmp_path_factory.mktemp("corrupt_in")
    write_pages_parquet(str(d / "good.parquet"), 200, seed=3)
    (d / "bad.parquet").write_bytes(b"PAR1 this is not a real parquet file")

    o1 = tmp_path_factory.mktemp("corrupt_out1")
    base = ["--input", str(d), "--output", str(o1 / "out"),
            "--manifest", str(o1 / "mf"), "--n-buckets", "4",
            "--bucket-group-size", "4"]
    with pytest.raises(Exception):
        jrun(jargs(base), spark=spark)

    o2 = tmp_path_factory.mktemp("corrupt_out2")
    got = jrun(jargs(["--input", str(d), "--output", str(o2 / "out"),
                      "--manifest", str(o2 / "mf"), "--n-buckets", "4",
                      "--bucket-group-size", "4",
                      "--ignore-corrupt-files"]), spark=spark)
    assert got["rows"] == 200  # every good row, no crash
    # the conf was restored on the reused session
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"


def test_dedup_job_paragraph_mode(spark, tmp_path_factory):
    """--paragraph: corpus-wide repeated paragraphs are removed from
    surviving docs, fully-duplicated docs drop entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dargs, run as drun

    boiler = "subscribe to our newsletter for updates"
    rows = [
        ("https://a/1", "unique alpha text\n" + boiler),
        ("https://a/2", boiler),                      # fully duplicated
        ("https://a/3", "unique beta text\n" + boiler),
    ]
    d = tmp_path_factory.mktemp("para_job")
    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    import datetime as dt

    ts = dt.datetime(2025, 1, 1)
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame([(u, ts, b"", t, "en") for u, t in rows],
                     columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=schema, preserve_index=False), str(d / "pages.parquet"))

    out = str(d / "out")
    got = drun(dargs(["--input", str(d / "pages.parquet"), "--output", out,
                      "--mode", "exact", "--paragraph"]), spark=spark)
    assert got["rows_after_paragraph"] == 2
    res = {r.url: r.text for r in spark.read.parquet(out).collect()}
    # url/1 keeps the boilerplate (first occurrence); /3 loses it; /2 gone
    assert res["https://a/1"] == "unique alpha text\n" + boiler
    assert res["https://a/3"] == "unique beta text"
    assert "https://a/2" not in res


def test_read_pages_rejects_nullfilled_schema(spark, tmp_path_factory):
    """Review round 3: the declared schema must not silently NULL-fill
    an input whose files carry different column names."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from incident_pii_redactor_spark.sources.catalog import read_pages

    d = tmp_path_factory.mktemp("wrong_cols")
    pq.write_table(pa.table({"page_url": ["https://a/1"],
                             "content": ["body text"]}),
                   str(d / "part.parquet"))
    with pytest.raises(ValueError, match="NULL-filling"):
        read_pages(spark, str(d))


def test_dedup_job_paragraph_mode_duplicate_urls(spark, tmp_path_factory):
    """Review round 3: recrawl snapshots share a url — their paragraphs
    must NOT interleave into one garbled rewrite."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dargs, run as drun

    d = tmp_path_factory.mktemp("dup_url_para")
    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us", tz="UTC")),
                        ("html", pa.binary()), ("text", pa.string()),
                        ("lang", pa.string())])
    t1, t2 = dt.datetime(2025, 1, 1), dt.datetime(2025, 2, 1)
    rows = [("https://a/1", t1, b"", "first snapshot body\nalpha", "en"),
            ("https://a/1", t2, b"", "second snapshot body\nbeta", "en")]
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=schema, preserve_index=False), str(d / "pages.parquet"))

    out = str(d / "out")
    drun(dargs(["--input", str(d / "pages.parquet"), "--output", out,
                "--mode", "exact", "--paragraph"]), spark=spark)
    texts = {(r.url, r.warc_ts.isoformat()): r.text
             for r in spark.read.parquet(out).collect()}
    assert texts[("https://a/1", "2025-01-01T00:00:00")] == \
        "first snapshot body\nalpha"
    assert texts[("https://a/1", "2025-02-01T00:00:00")] == \
        "second snapshot body\nbeta"


def test_pipeline_job_end_to_end_and_stage_skip(spark, tmp_path_factory):
    """jobs/pipeline.py: dedup -> scrub in one session; rerunning skips
    the committed dedup stage and the scrub resumes via its manifest."""
    from incident_pii_redactor_spark.sources.pages import (
        write_pages_parquet,
    )
    from jobs.pipeline import parse_args as pargs, run as prun

    d = tmp_path_factory.mktemp("pipe_in")
    write_pages_parquet(str(d / "pages.parquet"), 300, seed=5)
    wd = str(tmp_path_factory.mktemp("pipe_wd"))
    base = ["--input", str(d / "pages.parquet"), "--workdir", wd,
            "--dedup-mode", "both", "--n-buckets", "4",
            "--bucket-group-size", "4"]
    got = prun(pargs(base), spark=spark)
    assert got["dedup"]["rows_out"] <= 300
    n_scrubbed = spark.read.parquet(f"{wd}/scrubbed").count()
    assert n_scrubbed == got["dedup"]["rows_out"]

    again = prun(pargs(base), spark=spark)
    assert again["dedup"] == "skipped (committed output present)"
    assert again["scrub"]["groups_run"] == 0  # manifest: nothing pending
    assert spark.read.parquet(f"{wd}/scrubbed").count() == n_scrubbed


def test_dedup_job_incremental_against_history(spark, tmp_path_factory):
    """--against drops new-snapshot rows whose content already exists in
    the historical corpus, before intra-snapshot dedup."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("incdedup")
    ts = dt.datetime(2025, 1, 1)
    mk = lambda rows, path: pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), path)

    mk([("https://h/1", ts, b"", "historical article about shuffles", "en"),
        ("https://h/2", ts, b"", "another old page on broadcast joins", "en")],
       str(d / "history.parquet"))
    mk([  # new snapshot: one re-crawl of h/1's content, one genuinely new
        ("https://n/1", ts, b"", "historical article about shuffles", "en"),
        ("https://n/2", ts, b"", "a brand new page about watermarks", "en"),
        ("https://n/3", ts, b"", "a brand new page about watermarks", "en"),
    ], str(d / "new.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "new.parquet"),
         "--against", str(d / "history.parquet"),
         "--output", str(d / "out"), "--mode", "exact"]), spark=spark)
    assert stats["rows_in"] == 3
    assert stats["rows_after_against"] == 2  # n/1 dropped vs history
    assert stats["rows_out"] == 1            # n/3 dropped vs n/2 in-snapshot
    urls = {r.url for r in spark.read.parquet(str(d / "out")).collect()}
    assert urls == {"https://n/2"}


def test_scrub_job_from_html_equals_text_path(spark, pages_parquet,
                                              tmp_path_factory, cold_run):
    """--from-html re-derives text via functions/html.extract_text; on
    the synthetic crawl (where extraction reproduces the text column
    byte-for-byte) the job output must equal the default path's."""
    d = tmp_path_factory.mktemp("fromhtml")
    stats = run(parse_args(
        ["--input", pages_parquet, "--output", str(d / "out"),
         "--manifest", str(d / "mf"), "--n-buckets", "8",
         "--bucket-group-size", "8", "--from-html"]), spark=spark)
    assert stats["buckets_done"] == 8
    got = _read_all(spark, str(d / "out"))
    pd.testing.assert_frame_equal(got, cold_run)


def test_dedup_job_url_canonical_latest_wins(spark, tmp_path_factory):
    """--url-canonical keeps the NEWEST snapshot per canonical URL
    (tracking-param variants collapse; unrelated URLs untouched)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("urldedup")
    t1, t2 = dt.datetime(2025, 1, 1), dt.datetime(2025, 6, 1)
    rows = [
        ("https://a.example/p/1?utm_source=rss", t1, b"", "old snapshot", "en"),
        ("HTTPS://A.example/p/1#frag", t2, b"", "new snapshot", "en"),
        ("https://a.example/p/2", t1, b"", "unrelated page", "en"),
    ]
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), str(d / "pages.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "exact", "--url-canonical"]), spark=spark)
    assert stats["rows_after_url_canonical"] == 2
    got = {r.url: r.text for r in spark.read.parquet(str(d / "out")).collect()}
    assert got == {"HTTPS://A.example/p/1#frag": "new snapshot",
                   "https://a.example/p/2": "unrelated page"}


def test_export_job_shard_layout(spark, pages_parquet, tmp_path_factory):
    """jobs/export.py writes shard=K dirs; each shard's files hold rows
    in ascending pos with tiling tok_offsets, and the union equals the
    input — the layout a packed training loader seeks into."""
    import glob

    import pyarrow.parquet as pq2

    from jobs.export import parse_args as eargs, run as erun

    d = tmp_path_factory.mktemp("export")
    stats = erun(eargs(["--input", pages_parquet,
                        "--output", str(d / "shards"),
                        "--n-shards", "8"]), spark=spark)
    assert stats["shards"] == 8
    n_in = spark.read.parquet(pages_parquet).count()
    assert stats["rows"] == n_in

    urls = set()
    for k in range(8):
        files = sorted(glob.glob(str(d / "shards" / f"shard={k}" /
                                     "*.parquet")))
        assert files
        rows = []
        for f in files:
            rows.extend(pq2.read_table(f).to_pylist())
        rows.sort(key=lambda r: r["pos"])  # files may split; pos orders
        offset = 0
        for i, r in enumerate(rows):
            assert r["pos"] == i
            assert r["tok_offset"] == offset
            offset = r["tok_offset"] + _bpe_count(r["text"])
            urls.add(r["url"])
    assert len(urls) == n_in


def _bpe_count(text: str) -> int:
    import re as _re

    return len(_re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text or ""))


def test_dedup_job_from_html_prevents_placeholder_collapse(spark,
                                                           tmp_path_factory):
    """--from-html extracts BEFORE hashing: rows sharing a placeholder
    text column but carrying different html must NOT collapse (the
    silent-data-loss scenario of deduping a stale text column)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("fromhtmldedup")
    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("https://a/1", ts, b"<p>first real article body</p>", "", "en"),
        ("https://a/2", ts, b"<p>second distinct article</p>", "", "en"),
        ("https://a/3", ts, b"<p>first real article body</p>", "", "en"),
    ]
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), str(d / "pages.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "exact", "--from-html"]), spark=spark)
    # only the true html duplicate collapses; WITHOUT --from-html all
    # three placeholder texts would hash identically -> 1 row
    assert stats["rows_out"] == 2
    got = {r.url: r.text for r in spark.read.parquet(str(d / "out"))
           .collect()}
    assert set(got) == {"https://a/1", "https://a/2"}
    assert got["https://a/1"] == "first real article body"


def test_pipeline_resume_applies_from_html_to_scrub(spark, tmp_path_factory):
    """A committed deduped/ from a run WITHOUT --from-html must not leak
    stale text into a resumed run WITH it: the scrub stage re-extracts
    from the surviving html column."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.pipeline import parse_args as pargs, run as prun

    d = tmp_path_factory.mktemp("resumehtml")
    ts = dt.datetime(2025, 1, 1)
    seg = ("the quick brown fox jumps over the lazy dog and runs through "
           "the field while the sun rises slowly over the quiet hills")
    # three varied segments -> enough words to pass the keep thresholds
    body = " ".join([seg,
                     seg.replace("quick", "fast").replace("quiet", "green"),
                     seg.replace("fox", "cat").replace("sun", "moon")])
    rows = [("https://a/1", ts,
             f"<p>{body}</p>".encode(), "stale placeholder", "en")]
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), str(d / "pages.parquet"))

    base = ["--input", str(d / "pages.parquet"),
            "--workdir", str(d / "run"), "--dedup-mode", "exact",
            "--n-buckets", "2", "--bucket-group-size", "2"]
    prun(pargs(base), spark=spark)  # run 1: NO --from-html, commits deduped/
    import shutil

    shutil.rmtree(str(d / "run" / "scrubbed"))
    shutil.rmtree(str(d / "run" / "manifest"))
    prun(pargs(base + ["--from-html", "--run-id", "run2"]), spark=spark)
    out = spark.read.parquet(str(d / "run" / "scrubbed")).collect()
    assert len(out) == 1
    # the scrub consumed the EXTRACTED body, not the stale placeholder
    assert body.split()[1] in out[0].text_scrubbed
    assert "stale placeholder" not in out[0].text_scrubbed


def test_dedup_job_clean_unicode_unifies_lookalikes(spark,
                                                    tmp_path_factory):
    """--clean-unicode makes the NFC-composed and decomposed spellings
    of the same page hash identically, so they collapse in the exact
    stage (without the flag they both survive)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("unidedup")
    ts = dt.datetime(2025, 1, 1)
    composed = "Café menu du jour"
    decomposed = "Café menu du jour"
    assert composed != decomposed
    rows = [("https://a/1", ts, b"", composed, "fr"),
            ("https://a/2", ts, b"", decomposed, "fr"),
            ("https://a/3", ts, b"", "entirely different page", "en")]
    mk = lambda path: pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), path)
    mk(str(d / "pages.parquet"))

    without = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"),
         "--output", str(d / "o1"), "--mode", "exact"]), spark=spark)
    assert without["rows_out"] == 3  # byte-distinct -> no collapse
    with_flag = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"),
         "--output", str(d / "o2"), "--mode", "exact",
         "--clean-unicode"]), spark=spark)
    assert with_flag["rows_out"] == 2
    texts = {r.text for r in spark.read.parquet(str(d / "o2")).collect()}
    assert composed in texts  # survivors carry the NORMALIZED spelling


def test_dedup_job_against_history_respects_clean_unicode(
        spark, tmp_path_factory):
    """--against + --clean-unicode hash the SAME derivation on both
    sides: a historical page stored with decomposed accents / NBSP /
    CRLF must still kill its NFC-clean re-crawl (advice round 3 — the
    history side previously hashed raw, silently re-ingesting every
    normalizable cross-snapshot duplicate)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("againstuni")
    ts = dt.datetime(2025, 1, 1)
    composed = "Caf\u00e9 menu\ndu jour"  # NFC + LF, fresh-crawl bytes
    # NFD accent + NBSP + CRLF: bytes a WARC-era snapshot carries
    decomposed = "Cafe\u0301\u00a0menu\r\ndu jour"
    assert composed != decomposed
    mk = lambda rows, path: pq.write_table(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False), path)
    mk([("https://h/1", ts, b"", decomposed, "fr")],
       str(d / "history.parquet"))
    mk([("https://n/1", ts, b"", composed, "fr"),
        ("https://n/2", ts, b"", "a genuinely new page", "en")],
       str(d / "new.parquet"))

    stats = dedup_run(dedup_args(
        ["--input", str(d / "new.parquet"),
         "--against", str(d / "history.parquet"),
         "--output", str(d / "out"), "--mode", "exact",
         "--clean-unicode"]), spark=spark)
    assert stats["rows_after_against"] == 1  # n/1 == normalized h/1
    urls = {r.url for r in spark.read.parquet(str(d / "out")).collect()}
    assert urls == {"https://n/2"}


def test_dedup_against_bloom_matches_plain(spark, tmp_path_factory):
    """functions/bloom.py semijoin pushdown: --against-bloom must
    produce EXACTLY the plain --against output (false positives only
    add rows to the exact anti-join; false negatives are impossible),
    while the history side is pruned map-side before its shuffle."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dargs, run as drun

    d = tmp_path_factory.mktemp("against_bloom")
    ts = dt.datetime(2025, 1, 1)

    def mk(rows, path):
        pq.write_table(pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                        "lang"]),
            schema=pa.schema([("url", pa.string()),
                              ("warc_ts", pa.timestamp("us")),
                              ("html", pa.binary()), ("text", pa.string()),
                              ("lang", pa.string())]),
            preserve_index=False), path)

    # history: 300 docs; new snapshot: 40 docs, 15 of them re-crawls
    hist = [(f"https://h/{i}", ts, b"", f"historical page body {i} "
             f"with plenty of words {i}", "en") for i in range(300)]
    new = ([(f"https://n/{i}", ts, b"", f"historical page body {i} "
             f"with plenty of words {i}", "en") for i in range(15)]
           + [(f"https://n/{i}", ts, b"", f"fresh page body {i} "
               f"never seen before {i}", "en") for i in range(15, 40)])
    mk(hist, str(d / "history.parquet"))
    mk(new, str(d / "new.parquet"))

    base = ["--input", str(d / "new.parquet"),
            "--against", str(d / "history.parquet"), "--mode", "exact"]
    plain = drun(dargs(base + ["--output", str(d / "out_plain")]),
                 spark=spark)
    bloomed = drun(dargs(base + ["--output", str(d / "out_bloom"),
                                 "--against-bloom"]), spark=spark)
    assert plain["rows_after_against"] == 25
    assert bloomed["rows_after_against"] == 25
    assert bloomed["against_bloom_bytes"] > 0
    a = sorted(r.url for r in
               spark.read.parquet(str(d / "out_plain")).collect())
    b = sorted(r.url for r in
               spark.read.parquet(str(d / "out_bloom")).collect())
    assert a == b and len(a) == 25


def test_bloom_filter_properties(spark):
    """No false negatives ever; measured FP rate within ~3x the target;
    oversized blooms refuse to broadcast; deterministic across builds."""
    import pytest

    from incident_pii_redactor_spark.functions.bloom import (
        bloom_params, build_bloom, filter_might_contain,
    )
    import pyspark.sql.functions as F

    inserted = spark.range(2000).select(
        F.md5(F.concat(F.lit("in-"), F.col("id"))).alias("h"))
    bloom, k, m = build_bloom(inserted, "h", expected_keys=2000, fpp=0.01)
    bloom2, k2, m2 = build_bloom(inserted.repartition(7), "h",
                                 expected_keys=2000, fpp=0.01)
    assert (bloom, k, m) == (bloom2, k2, m2)  # partition-invariant bits

    # every inserted key passes (false negatives impossible)
    kept = filter_might_contain(inserted, "h", bloom, k, m).count()
    assert kept == 2000

    # disjoint keys: FP rate near the target
    other = spark.range(10_000).select(
        F.md5(F.concat(F.lit("out-"), F.col("id"))).alias("h"))
    fp = filter_might_contain(other, "h", bloom, k, m).count()
    assert fp / 10_000 < 0.03, f"fp rate {fp / 10_000}"

    m_exp, k_exp = bloom_params(2000, 0.01)
    assert (m, k) == (m_exp, k_exp) and m % 8 == 0 and k >= 1

    with pytest.raises(ValueError, match="512 MB"):
        bloom_params(10**12, 0.01)


def test_dedup_exact_keeps_keeper_rows_not_keeper_urls(spark,
                                                       tmp_path_factory):
    """Recrawl snapshots make url non-unique: with rows (A,X), (B,X),
    (B,Y), url B is Y's legitimate keeper but (B,X) must still drop —
    the keeper identity is (url, content), not url (review round 5)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("dedupid")
    t1, t2 = dt.datetime(2025, 1, 1), dt.datetime(2025, 6, 1)
    X = "shared content about spark engines " * 5
    Y = "completely different second crawl of the same url " * 5
    rows = [("https://a", t1, b"", X, "en"),
            ("https://b", t1, b"", X, "en"),
            ("https://b", t2, b"", Y, "en")]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))
    dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "exact"]), spark=spark)
    got = sorted((r.url, r.text) for r in
                 spark.read.parquet(str(d / "out")).collect())
    assert got == [("https://a", X), ("https://b", Y)]


def test_dedup_url_canonical_survives_null_warc_ts(spark,
                                                   tmp_path_factory):
    """A pages table whose warc_ts is all NULL must not vanish through
    the url-canonical semi join (NULL equi-keys match nothing without
    eqNullSafe; review round 5)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.dedup import parse_args as dedup_args, run as dedup_run

    d = tmp_path_factory.mktemp("dedupnullts")
    rows = [("https://a.example/p?utm_source=x", None, b"",
             "first page content here", "en"),
            ("https://b.example/q", None, b"",
             "second page content here", "en")]
    tbl = pa.Table.from_pandas(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                    "lang"]),
        schema=pa.schema([("url", pa.string()),
                          ("warc_ts", pa.timestamp("us")),
                          ("html", pa.binary()), ("text", pa.string()),
                          ("lang", pa.string())]),
        preserve_index=False)
    pq.write_table(tbl, str(d / "pages.parquet"))
    stats = dedup_run(dedup_args(
        ["--input", str(d / "pages.parquet"), "--output", str(d / "out"),
         "--mode", "exact", "--url-canonical"]), spark=spark)
    assert stats["rows_after_url_canonical"] == 2
    assert spark.read.parquet(str(d / "out")).count() == 2


def test_pipeline_rejects_dedup_flags_with_mode_none():
    from jobs.pipeline import parse_args as pipeline_args

    with pytest.raises(SystemExit):
        pipeline_args(["--input", "/x", "--workdir", "/y",
                       "--dedup-mode", "none", "--paragraph"])
    with pytest.raises(SystemExit):
        pipeline_args(["--input", "/x", "--workdir", "/y",
                       "--dedup-mode", "none", "--against", "/hist"])
    # without dedup-stage flags the combination is fine
    args = pipeline_args(["--input", "/x", "--workdir", "/y",
                          "--dedup-mode", "none", "--from-html"])
    assert args.dedup_mode == "none"


def test_scrub_rejects_from_warc_plus_from_html(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warcconflict")
    with pytest.raises(SystemExit):
        run(parse_args(
            ["--input", str(d / "x.warc.gz"), "--output", str(d / "o"),
             "--manifest", str(d / "m"), "--from-warc", "--from-html"]),
            spark=spark)
