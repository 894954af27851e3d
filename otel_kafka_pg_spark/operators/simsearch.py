"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      — brute-force exact top-k: broadcast the query vector,
                         JVM-side dot product via zip_with + aggregate. One
                         scan, no shuffle except the final top-k (which is a
                         TakeOrdered, not a full sort). The correctness
                         baseline.
- ``lsh_bucket_topk``  — random-hyperplane LSH: deterministic hyperplanes
                         derived from a seeded numpy RandomState inside a
                         vectorized pandas UDF produce a bucket id per
                         vector; search only the query's bucket (optionally
                         with multi-probe neighbors). The scale path: at
                         100 TB the bucket join prunes the candidate set by
                         ~2^bits before any distance math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _cosine(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(vec_col, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.dot(query, query)))
    if nq == 0.0:
        raise ValueError("query vector has zero norm — cosine similarity is undefined")
    return dot / (nv * F.lit(nq))


def drop_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """A NULL vector cannot participate in similarity: it is not a
    candidate, not a neighbor, not a near-dup of anything. Every vector
    operator filters them at entry — the JVM cosine would yield NULL rows,
    and the Arrow twins would crash ``np.stack``-ing a batch holding None
    (real 100 TB corpora have unembedded rows; the operators must not).
    Imputation/flagging policy belongs upstream of these operators.

    SIMILARITY operators additionally need ``drop_degenerate_vectors``;
    representation-only operators (``quantize_embeddings``, which encodes
    an all-zero vector exactly) use this NULL-only filter."""
    return df.filter(F.col(vec_col).isNotNull())


def drop_degenerate_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL-drop plus ZERO-NORM-drop — the entry filter for every COSINE
    path. A zero-norm vector (padding, failed embed) divides 0.0/0.0 = NaN,
    which under Spark's NaN-is-largest total order sorts ABOVE 1.0 in every
    descending top-k and passes every ``cosine >= threshold`` filter: one
    all-zero embedding would silently top every query's results and pollute
    every near-dup pair set. Cosine is undefined for it; it is dropped.

    The test is ``exists(v, x != 0)``, not a squared-norm aggregate:
    exists SHORT-CIRCUITS at the first nonzero element, so on real
    embeddings (dense, first element almost never exactly 0.0) the filter
    costs O(1) per row instead of a second full O(d) array pass on top of
    the cosine itself. Measured honestly: at sf0.1 both variants are
    within run-to-run noise of the null-only filter (~0.15 s brute-force
    scan either way) — the short-circuit form is chosen for the 10^12-row
    shape, where a second full array pass is real bandwidth."""
    return df.filter(
        F.col(vec_col).isNotNull() & F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))
    )


def cosine_topk(df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k; deterministic tiebreak on id."""
    df = drop_degenerate_vectors(df, vec_col)
    return (
        df.select(F.col(id_col), F.round(_cosine(F.col(vec_col), query), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def cosine_topk_pandas(
    df: DataFrame, query: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Arrow-vectorized twin of cosine_topk: the whole batch's similarity is
    one BLAS matrix-vector product inside a pandas UDF — the per-row cost at
    10^9-vector scale is memory bandwidth, not expression interpretation
    (the JVM zip_with/aggregate form evaluates a lambda per element). Same
    ordering/rounding as cosine_topk; top-k is still TakeOrdered."""
    df = drop_degenerate_vectors(df, vec_col)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0.0:
        raise ValueError("query vector has zero norm — cosine similarity is undefined")

    @pandas_udf(T.DoubleType())
    def cos(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    return (
        df.select(F.col(id_col), F.round(cos(F.col(vec_col)), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def make_bucketizer(dims: int, bits: int = 8, seed: int = 42):
    """Vectorized sign-LSH bucketizer: bucket = sign bits of V·H where H is a
    (dims × bits) hyperplane matrix from a seeded RNG — identical on every
    executor, so bucketing is reproducible cluster-wide."""
    planes = np.random.RandomState(seed).randn(dims, bits)

    @pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes) > 0
        return pd.Series((signs @ (1 << np.arange(bits))).astype(np.int32))

    return bucket


def fit_ivf_centroids(df: DataFrame, k: int = 8, sample: int = 1024, iters: int = 5, seed: int = 42,
                      vec_col: str = "embedding") -> np.ndarray | None:
    """Fit IVF centroids with mini-Lloyd iterations on a bounded seeded
    sample (standard IVF practice: the coarse quantizer is trained on a
    sample, then broadcast). Deterministic: seeded sample, seeded init.
    Driver memory is bounded by ``sample`` rows regardless of table size.
    Returns ``None`` on empty input (no vectors to fit) — callers fall
    back to brute force, as ``ivf_topk`` does."""
    rows = (
        drop_degenerate_vectors(df, vec_col).select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<double>").cast("string"), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    if not rows:
        return None  # empty input — caller falls back to brute force
    m = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.RandomState(seed)
    centroids = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            members = m[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its nearest centroid
    (Arrow-batched matrix math, centroids broadcast by closure), then run
    exact cosine only inside the query's ``n_probe`` nearest cells. At
    10^12 vectors the scan prunes to ~n_probe/n_centroids of the data, and
    the cell id is a natural partition/cluster key for the parquet layout."""
    cents = centroids if centroids is not None else fit_ivf_centroids(df, n_centroids, seed=seed, vec_col=vec_col)
    if cents is None:
        # no vectors to fit a quantizer on — brute force IS the exact
        # answer over whatever (empty) frame we got, with the same schema
        return cosine_topk(df, query, k, vec_col, id_col)

    @pandas_udf(T.IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    q = np.asarray(query, dtype=np.float64)
    qd = ((q[None, :] - cents) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(qd)[:n_probe]]
    celled = drop_degenerate_vectors(df, vec_col).withColumn("_cell", cell_of(F.col(vec_col)))
    return cosine_topk(celled.filter(F.col("_cell").isin(probe)), query, k, vec_col, id_col)


def probe_buckets(query: list[float], bits: int, seed: int, n_probe: int) -> list[int]:
    """Multi-probe bucket sequence for a query: every candidate bucket is
    ranked by its flip cost — the sum of |margin| over the hyperplanes whose
    sign must flip to reach it from the query's own bucket (cost 0 = the
    bucket itself, so it always probes first). This is full multi-probe LSH
    (Lv et al., VLDB'07): a hyperplane the query nearly touches is the one
    most likely to have cut it off from a neighbor, and MULTI-bit flips rank
    naturally by summed margin. (The previous single-bit-flip-only form
    capped the reachable probe set at bits+1 buckets, which capped recall at
    ~0.5 on near-uniform vectors regardless of n_probe.) Deterministic:
    seeded hyperplanes identical on every executor and on the driver.

    ``n_probe >= 2**bits`` returns EVERY bucket: the candidate set is then
    the whole table and the ANN result equals brute force exactly — the
    verification configuration (the dd3b/dd4 "exact oracle by parameter
    choice" pattern), still exercising the bucketize/probe machinery.

    Enumeration cost: all ``2**bits`` masks are ranked for bits ≤ 12; above
    that, flip masks are enumerated by increasing flip count
    (``itertools.combinations``) until the candidate pool exceeds n_probe —
    so the function ALWAYS returns exactly n_probe distinct buckets (never
    silently fewer; the pre-fix form capped the pool at O(bits²) and a
    large n_probe silently under-probed). Ranking within the generated pool
    is by summed margin; a >r-flip mask cheaper than some r-flip mask can
    in principle be missed, a standard multi-probe approximation."""
    if n_probe >= (1 << bits):
        return list(range(1 << bits))
    planes = np.random.RandomState(seed).randn(len(query), bits)
    proj = np.asarray(query) @ planes
    qbucket = int((proj > 0) @ (1 << np.arange(bits)))
    margins = np.abs(proj)
    if bits <= 12:
        masks: list[int] = list(range(1 << bits))
    else:
        from itertools import combinations

        masks = [0]
        for r in range(1, bits + 1):
            if len(masks) > n_probe:
                break
            masks.extend(sum(1 << i for i in idxs) for idxs in combinations(range(bits), r))
    ranked = sorted(masks, key=lambda m: (sum(margins[i] for i in range(bits) if m >> i & 1), m))
    return [qbucket ^ m for m in ranked[:n_probe]]


def lsh_bucket_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only inside the query's LSH
    bucket plus its ``n_probe-1`` closest-margin neighbor buckets.
    Single-bucket probing (n_probe=1) can return < k results and its
    recall degrades as ``bits`` grows; multi-probe restores recall while
    still pruning the scan to ~n_probe/2^bits of the data (recall vs
    brute force asserted at a fixed seed in tests)."""
    bucketize = make_bucketizer(len(query), bits, seed)
    buckets = probe_buckets(query, bits, seed, n_probe)
    bucketed = drop_degenerate_vectors(df, vec_col).withColumn("_bucket", bucketize(F.col(vec_col)))
    return cosine_topk(bucketed.filter(F.col("_bucket").isin(buckets)), query, k, vec_col, id_col)


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", bits: int = 8
) -> DataFrame:
    """Symmetric per-vector int8-style scalar quantization — the storage
    path a 100 TB embedding corpus actually ships (4 B float32 → 1 B int8 =
    4× smaller shuffles/scans for the ANN candidate stage).

    q_i = floor(v_i * qmax / max|v| + 0.5) with qmax = 2^(bits-1) - 1
    (127 for int8), scale = max|v| / qmax per vector. Dequantization is
    q_i * scale. Everything is computed with JVM built-ins (transform /
    aggregate / array_max) — no shuffle, no Python — and every step is
    IEEE-exact and reproducible cross-engine: float→double widening is
    exact, one multiply + one divide are correctly rounded, floor is exact.
    That makes the quantized integers themselves oracle-able (eq1 in the
    registry sums them in DuckDB with the same arithmetic).

    All-zero vectors (max|v| = 0) quantize to all-zero codes with scale 0
    rather than NaN. NULL vectors are dropped at entry like every vector
    operator (see drop_null_vectors).

    Columns: ``id_col``, ``q`` (array<long> codes), ``scale`` (double).
    """
    qmax = float((1 << (bits - 1)) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    code = F.transform(v, lambda x: F.floor(x * F.lit(qmax) / F.col("_maxabs") + F.lit(0.5)).cast("long"))
    zero = F.transform(v, lambda x: F.lit(0).cast("long"))
    return (
        drop_null_vectors(df, vec_col)
        .withColumn("_maxabs", maxabs)
        .select(
            F.col(id_col),
            F.when(F.col("_maxabs") > 0, code).otherwise(zero).alias("q"),
            (F.col("_maxabs") / F.lit(qmax)).alias("scale"),
        )
    )
