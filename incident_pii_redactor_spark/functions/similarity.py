"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k as the exact baseline, LSH-bucketed ANN as the
scale path.

Scale design: brute-force is a narrow map + one top-k (TakeOrdered — no
full sort); for a 10^9-vector corpus the LSH variant hashes each vector
to sign-bit buckets (deterministic hyperplanes from a seeded hash — no
RNG), so a query touches only its bucket's candidates. Hot buckets are a
skew concern -> probe multiple buckets and let AQE split them.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """<a, b> in double precision (floats cast first — matches DuckDB's
    list math on DOUBLE[] twin exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine to a literal query vector.
    Narrow scan + TakeOrdered(k): no shuffle of the corpus; only k rows
    travel. DuckDB twin: list_cosine_similarity + ORDER BY/LIMIT."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# --- LSH ANN -----------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: unit-variance values from a
    seeded multiplicative hash (no RNG state; same planes on every
    executor and in the oracle)."""
    with np.errstate(over="ignore"):  # uint64 wrap-around is the hash design
        idx = np.arange(dim * n_planes, dtype=np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + np.uint64(seed)
    h = (idx * np.uint64(0xBF58476D1CE4E5B9)) >> np.uint64(11)
    u = (h % np.uint64(1 << 24)).astype(np.float64) / float(1 << 24)  # U(0,1)
    # inverse-ish normal via sum of uniforms (Irwin-Hall, 4 terms)
    g = u.reshape(n_planes, dim)
    return g - 0.5  # mean-0 is all sign-LSH needs


def signbit_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    """Vectorized pandas UDF: embedding -> int bucket of sign bits.
    One numpy matmul per Arrow batch (no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_planes, seed)

    @pandas_udf("int")
    def bucket(emb: pd.Series) -> pd.Series:
        # null-tolerant: a NULL embedding hashes to bucket 0 instead of
        # crashing the whole job (brute-force cosine tolerates the row too)
        mat = np.stack(
            [np.zeros(dim, dtype=np.float64) if v is None else
             np.asarray(v, dtype=np.float64) for v in emb]
        )
        signs = (mat @ planes.T) > 0  # (batch, n_planes)
        vals = np.zeros(len(emb), dtype=np.int32)
        for b in range(n_planes):
            vals |= signs[:, b].astype(np.int32) << b
        return pd.Series(vals)

    return bucket


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-bucket
    (plus Hamming-1 probes to cut misses). At 10^9 vectors this scans
    ~ (1+n_planes)/2^n_planes of the corpus instead of all of it."""
    dim = len(query_vec)
    bucket = signbit_bucket_udf(dim, n_planes, seed)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for b in range(n_planes):
        if float(planes[b] @ qv) > 0:
            qsig |= 1 << b
    probes = [qsig] + [qsig ^ (1 << b) for b in range(n_planes)]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("_bucket", bucket(F.col(vec_col)))
        .filter(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# --- IVF ANN -----------------------------------------------------------------

def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_list: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> np.ndarray:
    """One-pass distributed IVF training: seed the coarse quantizer with
    sign-LSH buckets, then take each bucket's mean as its centroid (a
    single k-means step — deterministic, one groupBy over the corpus).
    Returns an (n_list', dim) float64 array collected to the driver
    (tiny: n_list x dim), to be shipped in UDF closures."""
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if first is None:
            raise ValueError("train_ivf_centroids: no non-null embeddings")
        dim = len(first[0])
    n_planes = max(1, int(math.log2(n_list)))
    bucket = signbit_bucket_udf(dim, n_planes, seed)

    def mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["_v"].to_numpy())
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0])],
                             "centroid": [mat.mean(axis=0).tolist()]})

    got = (
        df.select(F.col(vec_col).alias("_v"))
        .withColumn("_b", bucket(F.col("_v")))
        .groupBy("_b")
        .applyInPandas(mean_group, schema="_b int, centroid array<double>")
        .collect()
    )
    return np.array([r.centroid for r in sorted(got, key=lambda r: r._b)])


def ivf_assign_udf(centroids: np.ndarray):
    """embedding -> nearest-centroid list id (cosine), one matmul per
    Arrow batch. Centroids travel in the closure (KBs)."""
    from pyspark.sql.functions import pandas_udf

    c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    dim = c.shape[1]

    @pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.zeros(dim, dtype=np.float64) if v is None else
             np.asarray(v, dtype=np.float64) for v in emb]
        )
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ c.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_list: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: score only vectors whose inverted list is
    among the query's n_probe nearest centroids. At 10^9 vectors this
    scans ~n_probe/n_list of the corpus; in production the assignment
    column is precomputed/partitioned-by so probing prunes whole files."""
    centroids = train_ivf_centroids(df, vec_col, n_list, seed,
                                    dim=len(query_vec))
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probes = [int(i) for i in (cn @ qn).argsort()[::-1][:n_probe]]
    assign = ivf_assign_udf(centroids)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("_list", assign(F.col(vec_col)))
        .filter(F.col("_list").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_norms(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """L2 norm per vector — JVM-side. DuckDB twin: sqrt(list_sum(...))."""
    return df.select(F.col(id_col), F.round(norm(F.col(vec_col)), 6).alias("l2_norm"))
