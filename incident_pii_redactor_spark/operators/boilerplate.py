"""Host-level boilerplate removal — grouped ``applyInPandas`` operator.

Real Common-Crawl cleaning strips per-site template lines (nav, footer,
cookie banners) that line-level or doc-level rules can't see: a line is
boilerplate iff it recurs across MANY pages of the SAME host. That is a
grouped computation (key = host) with per-group pandas logic — the
canonical ``groupBy().applyInPandas`` shape.

Scale notes:
* one shuffle on host. Hosts are Zipf-skewed, so very large hosts are
  capped by sampling inside the group (line stats converge long before
  the full group is needed — we just cap the frequency pass, keeping the
  strip pass full). AQE skew handling does not apply to grouped-map, so
  the cap IS the skew strategy; truly pathological hosts can be
  pre-split with `salting.salted_repartition` at the cost of per-salt
  (not per-host) frequencies.
* deterministic: line frequencies and the strip decision are pure
  functions of the group's content; output is row-wise (url, cleaned
  text), independent of row order.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incident_pii_redactor_spark.operators.salting import url_host


def host_boilerplate_strip(
    pages: DataFrame,
    min_pages: int = 5,
    min_frac: float = 0.5,
    freq_sample_cap: int = 10_000,
) -> DataFrame:
    """Remove lines occurring in >= min_frac of a host's pages (hosts with
    < min_pages keep all lines — not enough evidence). Returns
    (url, host, text_clean, n_lines_removed)."""

    def strip_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n_pages = len(pdf)
        if n_pages < min_pages:
            return pd.DataFrame(
                {
                    "url": pdf["url"],
                    "host": pdf["host"],
                    "text_clean": pdf["text"],
                    "n_lines_removed": 0,
                }
            )
        # frequency pass (capped deterministically: first N by url order)
        sample = pdf.sort_values("url").head(freq_sample_cap)
        line_docfreq: dict[str, int] = {}
        for text in sample["text"]:
            for line in set(ln.strip() for ln in (text or "").split("\n")):
                if line:
                    line_docfreq[line] = line_docfreq.get(line, 0) + 1
        # ceil(n * min_frac), floor 2: '>= min_frac of the host's pages'
        # exactly as documented (a max(min_pages, ...) floor would silently
        # require a stricter fraction for hosts near min_pages)
        threshold = max(2, int(math.ceil(len(sample) * min_frac)))
        boiler = {ln for ln, c in line_docfreq.items() if c >= threshold}
        # strip pass (full group)
        cleaned, removed = [], []
        for text in pdf["text"]:
            lines = (text or "").split("\n")
            kept = [ln for ln in lines if ln.strip() not in boiler]
            cleaned.append("\n".join(kept))
            removed.append(len(lines) - len(kept))
        return pd.DataFrame(
            {
                "url": pdf["url"],
                "host": pdf["host"],
                "text_clean": cleaned,
                "n_lines_removed": removed,
            }
        )

    with_host = pages.select(
        "url", url_host(F.col("url")).alias("host"), "text"
    )
    schema = "url string, host string, text_clean string, n_lines_removed int"
    # unparseable-host rows pass through untouched — grouping them together
    # would compute "boilerplate" across UNRELATED sites and concentrate
    # every malformed url into one straggler task
    no_host = with_host.filter(F.col("host").isNull()).select(
        "url", "host", F.col("text").alias("text_clean"),
        F.lit(0).cast("int").alias("n_lines_removed"),
    )
    stripped = (
        with_host.filter(F.col("host").isNotNull())
        .groupBy("host")
        .applyInPandas(strip_group, schema=schema)
    )
    return stripped.unionByName(no_host)
