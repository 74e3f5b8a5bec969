"""KLL quantile sketch (functions/sketch.py): rank-error bounds,
mergeability, determinism, and the distributed build."""

from __future__ import annotations

import numpy as np
import pytest

from incident_pii_redactor_spark.functions.sketch import KLL, kll_sketch


def _max_rank_err(sketch: KLL, data: np.ndarray) -> float:
    data = np.sort(data)
    n = data.size
    errs = []
    for q in np.linspace(0.01, 0.99, 33):
        est = sketch.quantile(q)
        true_rank = np.searchsorted(data, est, side="right") / n
        errs.append(abs(true_rank - q))
    return max(errs)


def test_quantile_rank_error_bound_uniform_and_skewed():
    rng = np.random.default_rng(7)
    for data in (rng.uniform(0, 1, 200_000),
                 rng.lognormal(0, 3, 200_000),          # heavy skew
                 np.repeat(rng.uniform(0, 1, 50), 4000)):  # few distinct
        s = KLL(k=200)
        for chunk in np.array_split(data, 40):
            s.insert_batch(chunk)
        assert s.n == data.size
        assert _max_rank_err(s, data) < 0.025


def test_merge_matches_single_sketch_error():
    rng = np.random.default_rng(11)
    data = rng.normal(0, 1, 100_000)
    parts = np.array_split(data, 16)
    merged = KLL(k=200)
    for p in parts:
        s = KLL(k=200)
        s.insert_batch(p)
        merged = merged.merge(s)
    assert merged.n == data.size
    assert _max_rank_err(merged, data) < 0.03
    # serialization round trip preserves estimates
    back = KLL.from_bytes(merged.to_bytes())
    assert back.quantile(0.5) == merged.quantile(0.5)


def test_deterministic_same_input_same_sketch():
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 100, 50_000)
    a, b = KLL(k=128), KLL(k=128)
    for chunk in np.array_split(data, 10):
        a.insert_batch(chunk)
        b.insert_batch(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert a.quantile(q) == b.quantile(q)


def test_rank_and_edge_cases():
    s = KLL(k=64)
    assert np.isnan(s.quantile(0.5))
    s.insert_batch(np.array([5.0]))
    assert s.quantile(0.0) == 5.0 and s.quantile(1.0) == 5.0
    s2 = KLL(k=64)
    s2.insert_batch(np.arange(1000, dtype=float))
    r = s2.rank(499.0)
    assert abs(r - 0.5) < 0.05
    # NaNs ignored
    s3 = KLL(k=64)
    s3.insert_batch(np.array([np.nan, 1.0, np.nan]))
    assert s3.n == 1


def test_distributed_build_matches_exact_quantiles(spark):
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    sketch = kll_sketch(df.filter(F.col("value").isNotNull()), "value",
                        k=200)
    vals = np.sort(np.array([
        r["value"] for r in
        df.filter(F.col("value").isNotNull()).select("value").collect()
    ], dtype=np.float64))
    assert sketch.n == vals.size
    for q in (0.1, 0.5, 0.9, 0.99):
        est = sketch.quantile(q)
        true_rank = np.searchsorted(vals, est, side="right") / vals.size
        assert abs(true_rank - q) < 0.02
