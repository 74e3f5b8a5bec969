"""Compression-ratio quality signal (the Gopher/DCLM 'compression
filter'): templated, repetitive, or machine-generated text compresses
far better than natural prose, so zlib ratio is a cheap corpus-level
junk detector that catches what token-level heuristics miss (long
boilerplate with healthy word statistics).

Arrow-batched pandas UDF (zlib is C-speed; ~100 MB/s/core), emitting
INTEGER (raw_len, comp_len) so the ratio is one exact double division
JVM-side — no float accumulation, no rounding step. zlib output is a
deterministic function of (bytes, level, library); the driver oracle is
a golden fixture replayed by tools/make_fixtures.py in the same
environment.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEVEL = 6  # zlib default-ish; pinned for fixture determinism


def _lens(text: str) -> tuple[int, int]:
    b = text.encode("utf-8") if text else b""
    return len(b), len(zlib.compress(b, LEVEL))


def compression_lens_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<raw_len: long, comp_len: long>")
    def lens(text: pd.Series) -> pd.DataFrame:
        pairs = [_lens(t if isinstance(t, str) else "") for t in text]
        return pd.DataFrame({"raw_len": [p[0] for p in pairs],
                             "comp_len": [p[1] for p in pairs]})

    return lens


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ratio: float = 0.99,
    min_ratio: float = 0.30,
) -> DataFrame:
    """(id, raw_len, comp_len, ratio, keep): ratio = comp/raw (0 for
    empty docs). keep rejects BOTH tails — near-1.0 ratios are
    high-entropy noise (base64 blobs, minified junk), very low ratios
    are templated repetition."""
    lens = compression_lens_udf()
    ratio = F.when(
        F.col("raw_len") > 0,
        F.col("comp_len").cast("double") / F.col("raw_len"),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("_l", lens(F.col(text_col)))
        .select(F.col(id_col), F.col("_l.raw_len").alias("raw_len"),
                F.col("_l.comp_len").alias("comp_len"))
        .withColumn("ratio", ratio)
        .withColumn("keep",
                    (F.col("ratio") >= min_ratio)
                    & (F.col("ratio") <= max_ratio))
    )
