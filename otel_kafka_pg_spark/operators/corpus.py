"""Corpus-level training-data operators: vocabulary build, benchmark
contamination detection, stratified sampling.

These extend the engine beyond the reference's query surface (the
reference has no corpus tooling at all) with the operations a large-scale
training-data pipeline runs between dedup and packing. Every operator is
a pure DataFrame composition — one hash shuffle where unavoidable, no
Python in the hot path — and each carries an exact DuckDB oracle in the
registry (queries.py v1/ct1/sm1).

Scale notes (10^12-row corpus):

- ``vocab_topk``: explode → groupBy token is map-side partial-agg'd, so the
  shuffle carries one row per (partition, distinct token), not per token
  occurrence; the final top-k is a TakeOrdered, never a global sort.
- ``benchmark_contamination``: the benchmark side (held-out eval sets) is
  tiny by construction — its distinct gram set broadcasts, making the
  overlap join a broadcast-hash semi-join: the corpus side is scanned once
  and never shuffled by gram. Production hashes grams (xxhash64) to 8-byte
  keys; the oracle variant joins on gram STRINGS so DuckDB reproduces it.
- ``stratified_sample``: per-stratum deterministic ranking via a window
  partitioned by the stratum key — embarrassingly parallel per stratum,
  and the md5 rank key makes the sample reproducible across engines and
  runs (no RNG, no seed distribution problem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _tokens(text_col: str):
    """Lowercase whitespace tokens, empty-string-filtered."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Top-k token vocabulary with document frequency and total count —
    the vocabulary-build pass of a tokenizer-training pipeline.

    Deterministic total order (count DESC, token ASC) so the cut at k is
    stable. Columns: token, n_occurrences, n_docs.
    """
    toks = df.select(F.col("doc_id"), F.explode(_tokens(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def word_gram_strings(text_col: str, n: int = 5):
    """Word n-grams as strings via the shared zip-of-shifted-slices gram
    builder (functions/text.py:_gram_structs — the O(len) shape; a
    transform-lambda re-split would be O(len²)). Documents shorter than n
    words yield NO grams (contamination semantics: a 3-word doc cannot
    contain a 5-gram), unlike the shingle path's whole-text fallback —
    hence the size guard around the shared builder."""
    from ..functions.text import _gram_structs

    toks = _tokens(text_col)
    grams = F.transform(
        _gram_structs(toks, n, F.size(toks)),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 5,
) -> DataFrame:
    """Flag corpus documents sharing any word ``gram_n``-gram with a
    held-out benchmark set — the decontamination pass run before training
    so eval data cannot leak into the corpus (the standard n-gram-overlap
    definition of contamination).

    Returns (doc_id, n_overlap): one row per contaminated corpus doc with
    the count of distinct benchmark grams it contains. The benchmark gram
    set is broadcast (eval sets are tiny vs the corpus), so the corpus side
    joins without a shuffle; the final count groups by doc_id only over the
    matched rows (output-sized, not corpus-sized).
    """
    grams = word_gram_strings(text_col, gram_n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram")
    )
    return (
        corpus_grams.join(broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    per_stratum: int = 25,
) -> DataFrame:
    """Deterministic per-stratum quota sample: within each stratum, rank
    rows by ``md5(id)`` (a uniform, engine-portable pseudo-random key —
    no RNG state to distribute) and keep the first ``per_stratum``.

    The language-balancing pass of corpus assembly: equal-size samples per
    language regardless of the corpus's skew. Window is partitioned by the
    stratum — parallel across strata, and each stratum's sort is bounded by
    stratum size (strata far larger than executor memory would switch to
    the threshold form: approx the per-stratum md5 quantile, then filter —
    same determinism, no full per-stratum sort).
    """
    from pyspark.sql import Window

    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(rank_key, id_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_stratum)
        .select(strata_col, id_col, "rn")
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher composite quality filter (Rae et al. 2021, Table A1) as a
    reusable DataFrame op: the t7 per-row signal vector + the top-2-gram
    character fraction, AND-ed into a ``keep`` boolean at the paper's
    thresholds. ``passthrough`` columns ride along the per-row projection
    so composites can keep (text, source, ...) without a join back.

    Shape at scale: signals are zero-shuffle per-row expressions; the
    2-gram mode is explode → groupBy(doc_id, gram) partial-agg →
    per-doc struct-max, every stage keyed by doc_id, then a left join
    back to the signal frame on doc_id. See queries.t8 for the exact
    DuckDB oracle of both the signals and the verdict."""
    from ..functions import text as tx

    sig = df.select(
        id_col,
        *passthrough,
        F.length(text_col).alias("n_chars"),
        tx.token_count(text_col).alias("n_words"),
        tx.duplicate_line_fraction(text_col).alias("dup_line_frac"),
        tx.duplicate_line_char_fraction(text_col).alias("dup_line_char_frac"),
        tx.symbol_word_ratio(text_col).alias("symbol_word_ratio"),
        tx.bullet_line_fraction(text_col).alias("bullet_line_frac"),
        tx.ellipsis_line_fraction(text_col).alias("ellipsis_line_frac"),
        tx.alpha_word_fraction(text_col).alias("alpha_word_frac"),
        tx.mean_word_length(text_col).alias("mean_word_len"),
    )
    top = (
        df.select(id_col, F.explode(tx.word_2grams_all(text_col)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(F.col("cnt"), F.length("gram").alias("glen"), F.col("gram"))
            ).alias("m")
        )
    )
    scored = sig.join(top, id_col, "left").withColumn(
        "top2_char_frac",
        F.coalesce(
            F.col("m.cnt") * F.col("m.glen") / F.greatest(F.col("n_chars"), F.lit(1)),
            F.lit(0.0),
        ),
    )
    keep = (
        (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
        & (F.col("top2_char_frac") <= 0.2)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
    )
    return scored.withColumn("keep", keep).drop("m")


def mixture_sample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    total: int = 200,
) -> DataFrame:
    """Temperature-flattened mixture sampling — the corpus-assembly pass
    that rebalances a skewed source/language mix before training
    (mBERT/XLM-R style: sample source s with probability ∝ n_s^α, α<1, so
    tail sources are upweighted relative to their raw share). α is fixed
    at 0.5 and computed as ``floor(sqrt(n_s))`` INTEGER weights: IEEE
    sqrt is correctly rounded, the weight sum is integer (order-free),
    and each quota is one exact ``floor(total·isq_s / S)`` division — so
    the whole quota schedule is bit-identical cross-engine and the entry
    carries an exact DuckDB oracle (sm2). A general α is the one-line
    ``pow`` swap, traded away here because ``pow``'s cross-engine ulp
    agreement is not guaranteed.

    Within each stratum the quota is filled by the same deterministic
    md5-rank as ``stratified_sample`` (no RNG state to distribute).
    Every non-empty stratum gets quota ≥ 1 — a floor-rounded share of 0
    would EXCLUDE a tiny tail source, the exact opposite of temperature
    flattening's intent. Floor quotas can undershoot ``total`` by up to
    the stratum count (no largest-remainder top-up: that would need a
    cross-stratum ranking whose cross-engine determinism buys nothing
    for a sampling knob that is approximate by nature).
    Shape at scale: the count and quota frames are stratum-sized
    (broadcast); the only data-sized work is one window partitioned by
    the stratum key — parallel across strata."""
    from pyspark.sql import Window

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    w = counts.withColumn("isq", F.floor(F.sqrt(F.col("n_s"))).cast("long"))
    s_tot = w.agg(F.sum("isq").alias("S"))
    quotas = (
        w.crossJoin(broadcast(s_tot))
        .withColumn(
            "quota",
            F.greatest(
                F.floor(F.lit(total) * F.col("isq") / F.col("S")).cast("long"), F.lit(1)
            ),
        )
        .select(strata_col, "quota")
    )
    win = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.join(broadcast(quotas), strata_col)
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= F.col("quota"))
        .select(strata_col, id_col, "rn", "quota")
    )


def _hashed_bucket(tok, n_buckets: int):
    """Engine-portable hashed feature bucket: the shared md5-60-bit hash
    (functions/text.py:md5_60bit — one definition for every exactly-oracled
    consumer) mod n_buckets; production would swap in xxhash64."""
    from ..functions.text import md5_60bit

    return F.pmod(md5_60bit(tok), F.lit(n_buckets))


def importance_ratio(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each corpus
    document by how much its hashed-unigram feature profile looks like a
    small TARGET corpus relative to the raw corpus, for domain-targeted
    sampling.

    Emitted statistic: per document, the add-one-smoothed target and raw
    bucket-count sums over its token occurrences and their single-division
    ratio. DSIR's canonical weight is ``Σ log((c_t+1)/(c_r+1))`` over the
    same features; the count-ratio emitted here is the log-free sibling
    (shared normalization constants across docs make both
    ranking-statistics for "target-like") chosen because every value is
    exact integer arithmetic plus ONE IEEE division — bit-equal across
    engines, so the operator carries an exact DuckDB oracle (ds1) instead
    of trusting cross-engine ``log`` ulp agreement. The log weight is a
    one-line swap where bit-parity is not required.

    Shape at scale: the corpus tokenize+hash pass runs ONCE — both the
    raw distribution and the per-document sum consume the same
    ``groupBy(doc_id, bucket)`` pre-aggregation, built as an identical
    subtree so Catalyst's ReuseExchange executes its shuffle a single
    time (plan-asserted in tests). That pre-aggregation also means the
    per-document shuffle ships (doc_id, bucket, n) triples — bounded by
    docs × n_buckets — never raw token occurrences. Both distributions
    partial-aggregate to ≤ n_buckets rows; the feature table broadcasts;
    the target corpus (small by definition of DSIR) pays the only other
    scan."""
    db = (
        corpus.select(F.col(id_col), F.explode(_tokens(text_col)).alias("tok"))
        .select(id_col, _hashed_bucket(F.col("tok"), n_buckets).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tgt = (
        target.select(F.explode(_tokens(text_col)).alias("tok"))
        .select(_hashed_bucket(F.col("tok"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    raw = db.groupBy("b").agg(F.sum("n").alias("c_r"))
    feats = raw.join(tgt, "b", "left").select(
        "b", F.coalesce("c_t", F.lit(0)).alias("c_t"), "c_r"
    )
    return (
        db.join(broadcast(feats), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("n_toks"),
            F.sum(F.col("n") * (F.col("c_t") + 1)).alias("sum_target"),
            F.sum(F.col("n") * (F.col("c_r") + 1)).alias("sum_raw"),
        )
        .withColumn("ratio", F.round(F.col("sum_target") / F.col("sum_raw"), 6))
    )
