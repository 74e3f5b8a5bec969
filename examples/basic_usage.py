"""Basic usage of the engine — the Spark-first twin of the reference's
``examples/basic_usage.py`` (which demos ``await pipeline.process_text``
per document; here the same semantics run as one DataFrame operator).

Run: python examples/basic_usage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from incident_pii_redactor_spark.operators import quality_scrub
from incident_pii_redactor_spark.plans import build_session
from incident_pii_redactor_spark.quality.scorer import QualityConfig


def main() -> None:
    spark = build_session("basic-usage", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.createDataFrame(
        [
            ("https://site/a",
             "Our incident commander John Smith (john.smith@corp1.com) "
             "was paged at +1-555-123-4567 about host db-01.corp serving "
             "10.0.1.45. The card 4532-0151-1283-0366 was exposed but "
             "4532-0151-1283-0367 is a typo. " * 3),
            ("https://site/b", "too short to keep"),
            ("https://site/c",
             "the quick brown fox jumps over the lazy dog and runs through "
             "the green field while the sun rises slowly over the quiet "
             "hills this morning we walked to the market and bought bread " * 2),
        ],
        "url string, text string",
    )

    out = quality_scrub(
        pages,
        cfg=QualityConfig(min_words=20, max_perplexity=1e9),  # thresholds configurable
    )
    out.select("url", "keep", "drop_reason", "n_redactions").show(truncate=False)
    kept = out.filter("keep")
    print(kept.select("text_scrubbed").head()[0][:300], "...")
    print("redactions:", kept.agg(F.sum("n_redactions")).head()[0])
    spark.stop()


if __name__ == "__main__":
    main()
