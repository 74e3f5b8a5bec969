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
    """NULL for zero-norm vectors (cosine is undefined there) instead of
    a 0/0 division — under Spark 4's default ANSI mode the bare division
    aborts the whole job on the first all-zero embedding, while the
    DuckDB twin's double math yields NaN; NULL on the Spark side and NaN
    on the DuckDB side both fail a `>= threshold` filter, so the two
    engines agree wherever a result survives."""
    d = norm(a) * norm(b)
    return F.when(d != 0, dot(a, b) / d)


def cosine_pairs_udf(dim: int):
    """Arrow-batched pairwise cosine, BIT-IDENTICAL to the Column-fold
    ``cosine()``: accumulates column-at-a-time in float64, so every pair
    sees the exact IEEE op order of the sequential fold (dot then norms
    then sqrt/mul/div) while numpy vectorizes ACROSS pairs. The fold
    version allocates per-pair arrays inside zip_with/aggregate — ~35x
    slower on pairwise workloads (measured 68 s -> ~2 s on 2M pairs at
    bench sf0.1). Null input OR zero-norm vector -> null, matching the
    Column version's guarded NULL (NaN in a float64 pandas Series is
    coerced to null by the Arrow serializer — that coercion is the
    mechanism, there is no separate null mask)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(ea: pd.Series, eb: pd.Series) -> pd.Series:
        n = len(ea)
        null = np.fromiter(
            ((x is None) or (y is None) for x, y in zip(ea, eb)),
            dtype=bool, count=n,
        )
        zero = np.zeros(dim, dtype=np.float64)
        A = np.stack([zero if m else np.asarray(v, dtype=np.float64)
                      for v, m in zip(ea, null)])
        B = np.stack([zero if m else np.asarray(v, dtype=np.float64)
                      for v, m in zip(eb, null)])
        d = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(dim):  # sequential per pair = the fold's op order
            x, y = A[:, i], B[:, i]
            d = d + x * y
            na = na + x * x
            nb = nb + y * y
        denom = np.sqrt(na) * np.sqrt(nb)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom != 0, d / np.where(denom == 0, 1.0, denom),
                           np.nan)
        out[null] = np.nan  # NaN -> null at the Arrow boundary
        return pd.Series(out)

    return cos


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
    """Seeded-PCG Gaussian hyperplanes — deterministic for a given seed on
    every executor (the generator is rebuilt from the literal seed; no
    RNG state travels), and properly isotropic. Round-2 upgrade: the
    original multiplicative-hash uniform planes carried correlated sign
    bits that cost LSH recall (measured 8/990 missed near-dup pairs at
    sf0.01 vs 0/990 with Gaussians); all sign-LSH consumers (ANN top-k,
    IVF coarse quantizer, pairwise near-dup) now share this generator."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


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
    id_col: str = "vec_id",
) -> np.ndarray:
    """One-pass distributed IVF training: seed the coarse quantizer with
    sign-LSH buckets, then take each bucket's mean as its centroid (a
    single k-means step — one groupBy over the corpus). Returns an
    (n_list', dim) float64 array collected to the driver (tiny:
    n_list x dim), to be shipped in UDF closures.

    Each bucket's rows are sorted by ``id_col`` before the mean: numpy's
    pairwise float summation is ORDER-sensitive, and shuffle-read order
    is not guaranteed — without the sort, centroids (and everything
    probed through them) could drift between runs at the ulp level.
    Sorted, the whole pipeline is bit-deterministic, which is what lets
    the driver gate check ``emb_ivf_ann`` against a golden fixture."""
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if first is None:
            raise ValueError("train_ivf_centroids: no non-null embeddings")
        dim = len(first[0])
    n_planes = max(1, int(math.log2(n_list)))
    bucket = signbit_bucket_udf(dim, n_planes, seed)

    def mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_i")
        # float64 BEFORE the mean: Arrow delivers array<float> as
        # float32 — a float32 mean drifts ~1e-8 from the float64 fixture
        # replay (caught by emb_pq_codes' continuous recon_err; discrete
        # argmax paths masked it here)
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0])],
                             "centroid": [mat.mean(axis=0).tolist()]})

    got = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        # NULL embeddings cannot train (np.stack over None raises in
        # the worker; review round 5) — signbit_bucket_udf's null
        # tolerance is for ASSIGNMENT paths, not training
        .filter(F.col("_v").isNotNull())
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
                                    dim=len(query_vec), id_col=id_col)
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


# --- corpus-level near-dup (bucketed pairwise) -------------------------------

def band_keys_udf(dim: int, bands: int, band_bits: int, seed: int = 42):
    """Vectorized pandas UDF: embedding -> array of ``bands`` band keys.
    Key i packs that band's ``band_bits`` sign bits plus the band index,
    so a single-column equi-join compares (band, bits) at once. One
    matmul per Arrow batch — no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, bands * band_bits, seed)

    @pandas_udf("array<int>")
    def keys(emb: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.zeros(dim, dtype=np.float64) if v is None else
             np.asarray(v, dtype=np.float64) for v in emb]
        )
        bits = (mat @ planes.T) > 0  # (batch, bands*band_bits)
        out = np.zeros((len(emb), bands), dtype=np.int32)
        for b in range(bands):
            for k in range(band_bits):
                out[:, b] |= bits[:, b * band_bits + k].astype(np.int32) << k
            out[:, b] |= b << band_bits
        return pd.Series(list(out))

    return keys


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 40,
    band_bits: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Corpus-level embedding near-dup pairs via banded sign-LSH — the
    scale path that replaces the all-pairs BNLJ (VERDICT round-1 "one
    scale-killer"): bucket each vector into ``bands`` band keys, pair
    within buckets with a single-column EQUI-join (never a cross join),
    dedupe candidate pairs, then verify with the exact JVM-side cosine
    fold — the same ``cosine()`` expression as the brute-force query, so
    surviving pairs carry bit-identical cos_sim values.

    Recall is governed by (bands, band_bits): candidate probability for
    a pair at angle θ is 1-(1-(1-θ/π)^band_bits)^bands. Defaults (40×2)
    reproduce the exact all-pairs result at threshold 0.30 on both the
    sf0.01 (990/990) and sf0.1 (14922/14922) corpora — 24 bands missed 1
    of 14922 at sf0.1, matching the 0.6438^bands per-pair miss model;
    false positives are impossible (exact verification). At
    10^9-vector scale raise ``band_bits`` (16+) so bucket sizes stay
    bounded — the shuffle is band-key-partitioned either way, and skewed
    buckets split under AQE.

    Plan shape: the band shuffle carries only (id, band_key) — candidate
    ID pairs are deduped FIRST (narrow rows), then vectors join back from
    the base table and the ``_verify_pairs_arrow`` mapInArrow stage
    verifies (exact, bit-identical to the Column fold — round 6: it
    replays the same fold op order over zero-copy (n, dim) buffer views,
    removing the per-pair numpy materialization the pandas_udf paid).
    Carrying vectors through the band shuffle + dedupe was ~2x the
    shuffle bytes and the per-pair Column fold was ~35x slower than the
    Arrow batch."""
    dim_row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
    if dim_row is None:
        raise ValueError("embedding_near_dup_pairs: no non-null embeddings")
    dim = len(dim_row[0])
    keys = band_keys_udf(dim, bands, band_bits, seed)
    from incident_pii_redactor_spark.plans.session import (
        scan_parallelism_floor)

    # parallelism floor before the band-key UDF: a one-row-group source
    # is a single unsplittable task, serializing the matmul + explode on
    # one core (no-op at real scale — see scan_parallelism_floor)
    sig = scan_parallelism_floor(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col))
    ).select(
        "_id",
        F.explode(keys(F.col(vec_col))).alias("band_key"),
    )
    # materialization barrier (same rationale as minhash_lsh_pairs): the
    # self-join would otherwise evaluate the band-key UDF (vector scan +
    # matmul) once per side — measured 9.9 s -> 7.8 s warm at sf0.1.
    # localCheckpoint blocks release with the DataFrame; at real scale
    # persist signatures to a table instead.
    sig = sig.localCheckpoint(eager=True)
    a = sig.select(F.col("_id").alias("id_a"), "band_key")
    b = sig.select(F.col("_id").alias("id_b"), "band_key")
    pair_ids = (
        a.join(b, "band_key")  # equi-join on the packed (band, bits) key
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # dedupe across bands — narrow (two longs) rows
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("ea"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("eb"))
    # Verify via mapInArrow on the CONTIGUOUS list buffers (guide §4.2):
    # the former per-pair pandas_udf spent most of its time materializing
    # two small numpy arrays per row (Arrow list -> object Series); here
    # each batch's vectors are two zero-copy (n, dim) views and the
    # accumulation below replays cosine()'s exact sequential IEEE op
    # order column-at-a-time, so values stay bit-identical. Rounding and
    # thresholding stay on the JVM side exactly as before: Spark ROUND
    # is HALF_UP BigDecimal (numpy's is half-even — never round floats
    # for the gate in Python), and NaN (null input / zero norm) becomes
    # an Arrow NULL via from_pandas so the `>= threshold` filter drops
    # it (bare NaN would PASS — Spark orders NaN above every double).
    raw = _verify_pairs_arrow(
        pair_ids.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", "ea", "eb"), dim)
    # no ORDER BY here: a library-level global sort would shuffle every
    # surviving pair at corpus scale; callers needing deterministic
    # output order (the driver gate) sort the result themselves
    return (
        raw.select(
            "id_a", "id_b",
            F.round(F.col("_cos_raw"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _verify_pairs_arrow(pairs_vecs: DataFrame, dim: int) -> DataFrame:
    """(id_a, id_b, ea, eb) -> (id_a, id_b, _cos_raw double) with the
    UNROUNDED fold-order cosine; null where either vector is null or has
    zero norm (see caller). Fast path: reshape each Arrow list column's
    flattened value buffer to (n, dim) — no per-row allocation; batches
    containing null vectors fall back to the per-row path (flatten()
    drops null slots, which would misalign the reshape)."""
    import pyarrow as pa

    def verify(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ea, eb = batch.column("ea"), batch.column("eb")
            if ea.null_count == 0 and eb.null_count == 0 \
                    and len(ea.flatten()) == n * dim \
                    and len(eb.flatten()) == n * dim:
                A = np.asarray(ea.flatten()).astype(np.float64) \
                    .reshape(n, dim)
                B = np.asarray(eb.flatten()).astype(np.float64) \
                    .reshape(n, dim)
            else:
                # null LIST -> zeros (masked to NULL below); null list
                # ELEMENT -> NaN, which propagates through the fold to a
                # NaN cosine -> Arrow NULL -> dropped by the threshold
                # filter — exactly the old pandas path's NaN behavior
                zero = np.zeros(dim, dtype=np.float64)

                def row(v):
                    if v is None:
                        return zero
                    return np.asarray(
                        [np.nan if x is None else x for x in v],
                        dtype=np.float64)

                A = np.stack([row(v) for v in ea.to_pylist()])
                B = np.stack([row(v) for v in eb.to_pylist()])
            d = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(dim):  # the sequential fold's exact op order
                x, y = A[:, i], B[:, i]
                d = d + x * y
                na = na + x * x
                nb = nb + y * y
            denom = np.sqrt(na) * np.sqrt(nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(denom != 0,
                               d / np.where(denom == 0, 1.0, denom),
                               np.nan)
            if ea.null_count or eb.null_count:
                null = (~np.asarray(ea.is_valid())) | \
                       (~np.asarray(eb.is_valid()))
                out[null] = np.nan
            yield pa.RecordBatch.from_arrays(
                [batch.column("id_a"), batch.column("id_b"),
                 pa.array(out, type=pa.float64(), from_pandas=True)],
                ["id_a", "id_b", "_cos_raw"])

    return pairs_vecs.mapInArrow(
        verify, "id_a long, id_b long, _cos_raw double")


def embedding_norms(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """L2 norm per vector — JVM-side. DuckDB twin: sqrt(list_sum(...))."""
    return df.select(F.col(id_col), F.round(norm(F.col(vec_col)), 6).alias("l2_norm"))


# --- product quantization (IVF's companion: vector compression) -------------

def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 16,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
) -> list[np.ndarray]:
    """Product-quantization codebooks (Jégou et al. 2011): split each
    vector into ``m`` subvectors and learn ``<=ksub`` centroids per
    subspace. Training uses the SAME deterministic one-step sign-bucket
    k-means as ``train_ivf_centroids`` (per-subspace hyperplanes seeded
    ``seed + j``, bucket rows sorted by id before the numpy mean), so
    codebooks — and everything encoded through them — are
    bit-reproducible, which is what lets the driver gate check
    ``emb_pq_codes`` against a golden fixture.

    Returns a list of ``m`` (n_codes_j, dsub) arrays; code k in subspace
    j is row k (buckets sorted ascending — empty sign-buckets simply
    yield fewer codes, never a hole). At 10^9 vectors you'd train on a
    deterministic hash-sample (functions/sampling.py) — training cost is
    one narrow pass + a groupBy bounded by m*ksub groups."""
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if first is None:
            raise ValueError("train_pq_codebooks: no non-null embeddings")
        dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    n_planes = max(1, int(math.log2(ksub)))
    planes = [_hyperplanes(dsub, n_planes, seed + j) for j in range(m)]
    planes_arr = np.stack(planes)  # (m, n_planes, dsub)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        out = np.zeros((len(mat), m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            signs = (sub @ planes_arr[j].T) > 0  # (n, n_planes)
            out[:, j] = signs @ (1 << np.arange(n_planes))
        return pd.Series(list(out))

    def mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_i")
        j = int(pdf["_j"].iloc[0])
        # float64 BEFORE the mean (same reason as train_ivf_centroids)
        sub = np.stack(pdf["_v"].to_numpy()).astype(np.float64)[
            :, j * dsub:(j + 1) * dsub]
        return pd.DataFrame({
            "_j": [j], "_b": [int(pdf["_b"].iloc[0])],
            "centroid": [sub.mean(axis=0).tolist()],
        })

    got = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .filter(F.col("_v").isNotNull())  # nulls cannot train
        .withColumn("_bs", buckets(F.col("_v")))
        .select("_i", "_v", F.posexplode("_bs").alias("_j", "_b"))
        .groupBy("_j", "_b")
        .applyInPandas(mean_group, schema="_j int, _b int, centroid array<double>")
        .collect()
    )
    books: list[np.ndarray] = []
    for j in range(m):
        rows = sorted((r for r in got if r._j == j), key=lambda r: r._b)
        if not rows:
            raise ValueError(f"train_pq_codebooks: subspace {j} is empty")
        books.append(np.array([r.centroid for r in rows]))
    return books


def pq_encode_udf(codebooks: list[np.ndarray]):
    """embedding -> (codes array<int>, recon_err double): per subspace
    the L2-nearest centroid index (ties -> lowest, np.argmin), plus the
    full-vector reconstruction L2 error. One matmul per subspace per
    Arrow batch; codebooks travel in the closure (m*ksub*dsub doubles —
    KBs)."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    dsub = codebooks[0].shape[1]

    @pandas_udf("struct<codes: array<int>, recon_err: double>")
    def encode(emb: pd.Series) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        codes = np.zeros((len(mat), m), dtype=np.int32)
        recon = np.zeros_like(mat)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            c = codebooks[j]
            # ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 ; ||x||^2 constant per row
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
            codes[:, j] = d2.argmin(axis=1)
            recon[:, j * dsub:(j + 1) * dsub] = c[codes[:, j]]
        err = np.sqrt(((mat - recon) ** 2).sum(axis=1))
        return pd.DataFrame({"codes": list(codes), "recon_err": err})

    return encode


def pq_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    ksub: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, code string 'c0|c1|...', recon_err double round-6): the PQ
    compression table. At scale this replaces 4*dim bytes per vector
    with m bytes (+ one shared codebook), the standard memory shape for
    billion-vector ANN (IVF selects lists, PQ scores them)."""
    books = train_pq_codebooks(df, vec_col, m, ksub, seed, id_col=id_col)
    enc = pq_encode_udf(books)
    return (
        df.withColumn("_e", enc(F.col(vec_col)))
        .select(
            F.col(id_col),
            F.array_join(F.col("_e.codes"), "|").alias("code"),
            F.round(F.col("_e.recon_err"), 6).alias("recon_err"),
        )
    )


def pq_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 16,
    ksub: int = 16,
    seed: int = 42,
    rerank: int = 10,
) -> DataFrame:
    """ADC (asymmetric distance computation) shortlist + exact rerank —
    the query-side half of IVF-PQ. The query builds one tiny
    per-subspace lookup table ``lut[j][c] = ||q_j - centroid_c||^2``
    driver-side; every stored vector is scored by summing m table
    lookups over its CODES — the shortlist scan never touches the
    embedding column (m bytes/row instead of 4*dim; the LUT rides the
    plan as array literals, pure Catalyst element_at + sum). The
    ``k * rerank`` ADC-nearest candidates are then reranked by EXACT L2
    over their real embeddings — the standard two-stage shape (PQ is a
    candidate generator; iid-random corpora like the test tables are
    its adversarial worst case, which reranking absorbs).

    Returns (id, l2_dist round-6) ascending, exact over the shortlist.
    In production the codes table is precomputed (``pq_codes``) and
    stage 1 scans ONLY (id, codes); training is in-line here for
    self-containment."""
    if rerank < 1:
        raise ValueError(f"rerank must be >= 1, got {rerank}")
    books = train_pq_codebooks(df, vec_col, m, ksub, seed, id_col=id_col)
    dsub = books[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != {m * dsub}")
    luts = []
    for j in range(m):
        qj = q[j * dsub:(j + 1) * dsub]
        luts.append(((books[j] - qj[None, :]) ** 2).sum(axis=1))

    enc = pq_encode_udf(books)
    coded = df.withColumn("_codes", enc(F.col(vec_col)).getField("codes"))
    adc = None
    for j in range(m):
        lut = F.array(*[F.lit(float(v)) for v in luts[j]])
        term = F.element_at(lut, F.col("_codes")[j] + 1)
        adc = term if adc is None else adc + term
    shortlist = (
        coded.select(F.col(id_col), adc.alias("_adc"))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(k * rerank)
    )
    # exact L2 on the tiny shortlist only (broadcast semi-join back to
    # the embeddings; k*rerank rows)
    qcol = F.array(*[F.lit(float(v)) for v in q])
    diff2 = F.aggregate(
        F.zip_with(F.col(vec_col), qcol, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(F.broadcast(shortlist.select(id_col)), id_col)
        .select(F.col(id_col), F.round(F.sqrt(diff2), 6).alias("l2_dist"))
        .orderBy(F.asc("l2_dist"), F.asc(id_col))
        .limit(k)
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
) -> np.ndarray:
    """Distributed Lloyd's k-means, BIT-DETERMINISTIC (the iterative-
    algorithm pattern: driver holds the tiny model, executors do one
    assign+partial-mean pass per iteration).

    * init: the deterministic sign-bucket means (same recipe as IVF),
      sliced to the k buckets with most members (ties -> lower bucket);
    * assign: argmin squared-L2 via ||c||^2 - 2 x.c (ties -> lowest
      centroid, np.argmin);
    * update: per-cluster mean over float64 vectors with rows SORTED by
      id before the numpy mean (pairwise summation is order-sensitive);
      empty clusters keep their previous centroid.

    Each iteration is one narrow pass + a groupBy bounded by k groups;
    the centroids (k*dim doubles) travel in UDF closures. Scale: at
    10^9 vectors this is the standard Spark k-means shape (MLlib does
    the same with partial aggregates); determinism here additionally
    pins a golden-fixture oracle."""
    if dim is None:
        first = df.select(vec_col).filter(F.col(vec_col).isNotNull()).head()
        if first is None:
            raise ValueError("kmeans_fit: no non-null embeddings")
        dim = len(first[0])
    n_planes = max(1, int(math.log2(max(2, k))))
    # init from sign-bucket means (more buckets than k; pick k largest)
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_planes + 1, seed)

    @pandas_udf("int")
    def bucket(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        signs = (mat @ planes.T) > 0
        return pd.Series((signs @ (1 << np.arange(n_planes + 1)))
                         .astype(np.int32))

    def mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_i")
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"_b": [int(pdf["_b"].iloc[0])],
                             "n": [len(pdf)],
                             "centroid": [mat.mean(axis=0).tolist()]})

    base = (df.select(F.col(id_col).alias("_i"),
                      F.col(vec_col).alias("_v"))
            .filter(F.col("_v").isNotNull()))  # nulls cannot train
    got = (
        base.withColumn("_b", bucket(F.col("_v")))
        .groupBy("_b")
        .applyInPandas(mean_group,
                       schema="_b int, n long, centroid array<double>")
        .collect()
    )
    got.sort(key=lambda r: (-r.n, r._b))
    cents = np.array([r.centroid for r in got[:k]])
    if len(cents) < k:
        raise ValueError(f"kmeans_fit: init produced {len(cents)} < k={k}")

    for _ in range(n_iter):
        c = cents

        @pandas_udf("int")
        def assign(emb: pd.Series) -> pd.Series:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
            return pd.Series(d2.argmin(axis=1).astype(np.int32))

        got = (
            base.withColumn("_b", assign(F.col("_v")))
            .groupBy("_b")
            .applyInPandas(mean_group,
                           schema="_b int, n long, centroid array<double>")
            .collect()
        )
        new = cents.copy()  # empty clusters keep previous centroid
        for r in got:
            new[int(r._b)] = np.asarray(r.centroid, dtype=np.float64)
        cents = new
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster int, dist double): final assignment + exact L2
    distance to the assigned centroid (fold-free: numpy per batch, same
    expression as training so a fixture replay matches bit-for-bit)."""
    from pyspark.sql.functions import pandas_udf

    c = centroids

    @pandas_udf("struct<cluster: int, dist: double>")
    def ass(emb: pd.Series) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
        cl = d2.argmin(axis=1)
        diff = mat - c[cl]
        dist = np.sqrt((diff * diff).sum(axis=1))
        return pd.DataFrame({"cluster": cl.astype(np.int32),
                             "dist": dist})

    return df.withColumn("_a", ass(F.col(vec_col))).select(
        F.col(id_col),
        # bigint per the driver result-type policy (int32 is hash-hostile)
        F.col("_a.cluster").cast("bigint").alias("cluster"),
        F.round(F.col("_a.dist"), 6).alias("dist"),
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by k-means
    clustering then within-cluster cosine — the method that pruned
    LAION/C4 by 50% with no quality loss. Clustering is what makes the
    pairwise step scale-sane: candidates only ever meet INSIDE a
    cluster, so the join is a plain equi-join on the cluster id (never
    a corpus BNLJ) and per-cluster pair counts are (n/k)^2. At 10^9
    vectors you raise k so clusters stay ~10^4-10^5 (SemDeDup used
    50k clusters) and optionally cap per-cluster candidates by distance
    to centroid — the same bounded-bucket argument as the LSH band join.

    Returns (id, cluster, keep): keep=false iff some SMALLER id in the
    same cluster is cosine-similar above ``threshold`` (one-step
    min-id-wins, the dedup job's standard policy). Bit-deterministic
    end-to-end: kmeans_fit is deterministic and the pairwise cosine is
    the fold-order ``cosine_pairs_udf``."""
    cents = kmeans_fit(df, k=k, n_iter=n_iter, vec_col=vec_col,
                       id_col=id_col, seed=seed)
    assigned = kmeans_assign(df, cents, vec_col=vec_col, id_col=id_col) \
        .select(id_col, "cluster")
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("ea"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("eb"))
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col("cluster").alias("cluster"))
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col("cluster").alias("cluster"))
    # same zero-per-row-allocation verify as embedding_near_dup_pairs
    # (bit-identical fold-order cosine; JVM-side HALF_UP round + NaN->
    # NULL threshold semantics — see _verify_pairs_arrow)
    raw = _verify_pairs_arrow(
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", "ea", "eb"), int(cents.shape[1]))
    pairs = (
        raw.select("id_a", "id_b",
                   F.round(F.col("_cos_raw"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # NO forced broadcast: a SemDeDup drop list is 30-50% of the corpus
    # at production thresholds — let AQE pick the join strategy
    return (
        assigned.join(drops.withColumn("_drop", F.lit(True)),
                      id_col, "left")
        .select(id_col, "cluster",
                F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )
