"""Deduplication operators for training-data pipelines.

Four strategies, each with a distinct scale profile:

- exact_dedup          — hash-groupBy on content; one shuffle on the
                         fingerprint, min-id survivor (deterministic, unlike
                         dropDuplicates whose survivor depends on scheduling).
- ngram_jaccard_pairs  — exact pairwise Jaccard within a bounded candidate
                         set (quadratic; the verification primitive).
- minhash_lsh_pairs    — MinHash signatures + banded LSH: near-dup candidate
                         generation that scales linearly in rows; the
                         quadratic step only runs inside hash buckets. This
                         is the 100 TB path.
- simhash              — 64-bit SimHash per doc, pure JVM: exploded tokens,
                         xxhash64, 64 per-bit vote-sum aggregates; near-dups
                         are docs at small Hamming distance, found by exact
                         bucket join on max_hamming+1 disjoint bit blocks
                         (pigeonhole: ≤h flipped bits can't touch all h+1
                         blocks, so recall is exact at the threshold).

MinHash/LSH is pure JVM expressions: hashed shingles (xxhash64 straight
off the token array, no gram strings) → linear-permutation mins → band
hashes → explode → self-join on (band, hash). No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: groupBy(sha256(normalized text)) keeping the
    smallest id — deterministic survivor, unlike dropDuplicates."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Repeated-paragraph removal (the RefinedWeb/Falcon exact-substring
    dedup at paragraph granularity): every paragraph that appears more than
    once ANYWHERE in the corpus keeps only its globally-first occurrence
    (min ``(doc_id, position)``); later occurrences are cut from their
    documents, which are then re-assembled in original paragraph order.

    Returns one row per input document: (doc_id, clean_text, n_kept,
    n_removed) — a fully-boilerplate document survives with
    ``clean_text=''`` so downstream length filters can drop it explicitly.

    Semantics: duplicate identity is ``trim(paragraph)``;
    whitespace-only paragraphs are NEVER treated as duplicates (they are
    formatting, not content — and the empty string would otherwise be the
    corpus's hottest key).

    Shape at scale (the reason this is NOT a window over the paragraph
    key): ``row_number() OVER (PARTITION BY para)`` must co-locate and
    SORT every copy of a paragraph — a boilerplate footer occurring 10⁹
    times becomes one giant sorted partition. Instead the winner per
    paragraph is ``groupBy(fp).min(struct(doc_id, pos))`` — partial
    aggregation collapses each map partition's copies to ONE row before
    the shuffle, so the hot key ships O(num_partitions) rows, not O(n).
    The join back is a plain equi-join on the fingerprint; its residual
    probe-side skew (every copy of a hot paragraph hashes to one
    partition) is the shape AQE's skew-join splitting relieves at
    runtime — an escape hatch a sort window does not have. The only
    other shuffle is the per-document rebuild keyed by doc_id (uniform),
    and the shuffled dedup key is a fixed-width sha256, never text."""
    import re as _re

    # sep is a LITERAL separator everywhere (split, rejoin, oracle) — escape
    # it for F.split's regex so e.g. sep="||" can't become an empty
    # alternation that splits between every character
    sep_re = _re.escape(sep)
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("pos", "para"),
    )
    nonempty = paras.filter(F.trim("para") != "").withColumn(
        "fp", F.sha2(F.trim("para"), 256)
    )
    winners = nonempty.groupBy("fp").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w")
    )
    kept_ne = (
        nonempty.join(winners, "fp")
        .filter((F.col(f"w.{id_col}") == F.col(id_col)) & (F.col("w.pos") == F.col("pos")))
        .select(id_col, "pos", "para")
    )
    kept = kept_ne.unionByName(paras.filter(F.trim("para") == ""))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s["para"]
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), sep_re)).alias("n_paras")
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_paras") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


# shared guard for the two brute-force all-pairs generators
# (ngram_jaccard_pairs, embedding_cosine_pairs)
_UNBOUNDED_PAIRS_CAP = 10_000


def _auto_config(threshold: float, target_recall: float = 0.95) -> tuple[int, int]:
    """Threshold-derived sketch sizing: rows-per-band fixed at 2 and bands
    solved from the LSH S-curve so candidate probability at s=threshold is
    ≥ target_recall: 1-(1-t²)^b ≥ R ⇒ b = ⌈ln(1-R)/ln(1-t²)⌉.

    Why r=2: r=1 makes any single shared min a candidate (probability 0.81
    even at s=0.05 with 32 bands — measured 10M+ candidate pairs at sf0.1,
    verification dominates); r≥4's S-curve is too steep to reach 0.95
    recall below s≈0.6 without hundreds of hashes. Round 1's fixed
    bands=8×r=4 silently had seed-luck recall at thresholds < 0.6 (caught
    by the planted-pair test when the hash family changed). Low thresholds
    therefore cost more bands — that is the honest LSH economics, not a
    tuning failure: t=0.3 → 32 bands (64 hashes), t=0.5 → 11, t=0.7 → 5."""
    import math

    # clamp into (0,1) exclusive: t>=1.0 would log(0), t<=0 would divide by
    # log(1)=0 — edge thresholds degrade to the nearest solvable curve
    # instead of crashing (ADVICE r2)
    t = min(max(threshold, 0.05), 0.95)
    b = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - t**2))
    b = max(4, min(b, 48))
    return 2 * b, b


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int | None = None,
    threshold: float = 0.5,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with exact
    shingle Jaccard.

    ``max_bucket`` is the hot-bucket (boilerplate-skew) guard: a band
    bucket with B members generates B² candidate pairs, and real corpora
    concentrate boilerplate (templates, empty docs, license headers) into
    a few mega-buckets — the classic quadratic killer of LSH self-joins at
    scale. Buckets larger than ``max_bucket`` are excluded from candidate
    generation (one count-aggregate + semi-join on the SAME key as the
    self-join, so no extra partitioning). Recall trade, stated: a pair
    whose every shared bucket is capped is missed — but members of a
    mega-bucket are near-identical by construction, which is exactly the
    mass upstream EXACT dedup (dd1, always first in the dp chains)
    collapses; run exact dedup before near-dup and the cap costs ~nothing.
    Default None preserves exact banded-LSH semantics (the oracle config).

    ``bands=None`` (default) sizes BOTH num_hashes and bands from the
    threshold for ≥0.95 candidate recall at s=threshold (_auto_config —
    num_hashes is then ignored); pass both explicitly to trade candidate
    volume against recall by hand.

    Shaped for scale (and measured ~10× faster than the HOF formulation at
    5k docs; the hashed-shingle + linear-permutation form below another
    ~4× on top — see hashed_shingles):

    1. hash each word k-gram straight off the token array
       (``hashed_shingles`` — no per-gram string allocation), explode to
       (id, gram_hash) rows;
    2. derive the num_hashes permutation values per gram as
       ``xxhash64(gram_hash, j)`` — rehashing an 8-byte LONG per
       permutation is cheap (the round-1 cost was hashing the gram STRING
       num_hashes times) and gives fully independent permutations. (A
       ``lo32 + j·hi32`` linear family was tried and REJECTED: for large j
       the argmin converges to the gram with the smallest hi32, so
       permutations correlate and recall collapses on superset-shaped
       near-dups — caught by the planted-pair test.) groupBy(id) with
       min() per column → the signature (map-side partial min, one narrow
       shuffle keyed by id);
    3. band hashes from the signature, explode to (band, bh, id), self-join
       on (band, bh) over candidate IDs ONLY (the shingle sets stay out of
       the band shuffle);
    4. verify candidates by joining the gram-hash sets back twice and
       computing exact Jaccard on array<long> (identical to string-shingle
       Jaccard w.h.p.; pinned by the dd3b brute-force oracle and an
       equivalence test vs word_shingles).
    """
    from ..functions.text import hashed_shingles

    if bands is None:
        num_hashes, bands = _auto_config(threshold)
    if not 1 <= bands <= num_hashes or num_hashes % bands != 0:
        # bands > num_hashes would make rows_per_band 0 — every band hash a
        # CONSTANT, every doc in one bucket, and the self-join a full O(n²)
        # cross join; an indivisible combo would silently discard the
        # trailing num_hashes % bands signatures, changing recall from what
        # the caller configured. Both must be loud.
        raise ValueError(
            f"bands must divide num_hashes with 1 <= bands <= num_hashes "
            f"(got num_hashes={num_hashes}, bands={bands})"
        )
    rows_per_band = num_hashes // bands
    shingled = df.select(F.col(id_col).alias("id"), hashed_shingles(text_col, shingle_k).alias("sh"))
    flat = shingled.select("id", F.explode("sh").alias("s"))
    sig = flat.groupBy("id").agg(
        *[F.min(F.xxhash64(F.col("s"), F.lit(j))).alias(f"h{j}") for j in range(num_hashes)]
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bh")
    if max_bucket is not None:
        ok = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") <= max_bucket)
            .select("band", "bh")
        )
        banded = banded.join(ok, ["band", "bh"])

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jacc = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(jacc, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    max_id: int | None = None,
    threshold: float = 0.2,
    allow_unbounded: bool = False,
) -> DataFrame:
    """Exact pairwise word-k-gram Jaccard over a bounded id range (the
    brute-force baseline the LSH variant approximates).

    Same unbounded-input guard as ``embedding_cosine_pairs`` — with
    ``max_id=None`` this is an all-pairs O(n²) self-join; inputs beyond
    the cap raise (``allow_unbounded=True`` overrides knowingly; the
    scale path is ``minhash_lsh_pairs``)."""
    base = df
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    elif not allow_unbounded:
        n = base.limit(_UNBOUNDED_PAIRS_CAP + 1).count()
        if n > _UNBOUNDED_PAIRS_CAP:
            raise ValueError(
                f"ngram_jaccard_pairs without max_id is all-pairs O(n²) and the "
                f"input exceeds {_UNBOUNDED_PAIRS_CAP} rows — use minhash_lsh_pairs "
                "(the scale path) or pass allow_unbounded=True / a max_id bound"
            )
    s = base.select(F.col(id_col).alias("id"), word_shingles(text_col, shingle_k).alias("sh"))
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    jacc = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(F.array_union("a.sh", "b.sh"))
    return (
        pairs.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.round(jacc, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def span_dup_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_n: int = 3,
    hash_impl: str = "md5",
) -> DataFrame:
    """Cross-document duplicated-SPAN detection — the span-granular dedup
    signal of ExactSubstr (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): for every word ``gram_n``-gram
    occurrence in every document, test whether that exact span occurs
    anywhere ELSE in the corpus (any document, any position — a repeat
    within the same document counts, as in ExactSubstr), and emit the
    per-document duplicated-span fraction. Doc-granular dedup (dd1/dd3/dd4)
    cannot see a document that is 40% boilerplate and 60% fresh; this
    operator is the signal that catches it. Lee et al. build suffix arrays
    on one machine; the distributed re-expression is gram-occurrence
    frequency counting, exact for spans of length ``gram_n``.

    Returns (doc_id, n_grams, n_dup, dup_frac): total gram positions,
    positions whose span occurs >1 time corpus-wide, and their single
    IEEE division rounded to 6 places (exact cross-engine; oracle dd7).

    Shape at scale: grams hash to fixed-width md5-60-bit longs
    (production: xxhash64) BEFORE any shuffle, so no shuffle ever ships
    span text. THREE exchanges total: the gram-frequency partial-agg and
    the occurrence⋈frequency join (both keyed by the 8-byte hash, the
    frequency side collapsing to one row per task × distinct gram), then
    the final per-doc count keyed by doc_id — itself partial-agg'd, so
    it ships at most one row per (task, doc). No stage is quadratic.

    ``hash_impl``: "md5" is the engine-portable md5-60-bit hash (exact
    DuckDB oracle, dd7); "xxhash64" is the production path (codegen, no
    digest cost — the dd4/dd4x, t6/t6x split), rows-only checkable.
    """
    from ..functions.text import md5_60bit
    from .corpus import word_gram_strings

    hasher = md5_60bit if hash_impl == "md5" else F.xxhash64
    occ = df.select(
        F.col(id_col), F.explode(word_gram_strings(text_col, gram_n)).alias("gram")
    ).select(id_col, hasher(F.col("gram")).alias("gh"))
    freq = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("n_occ"))
    n_dup = F.sum((F.col("n_occ") > 1).cast("long"))
    return (
        occ.join(freq, "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"), n_dup.alias("n_dup"))
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup").cast("double") / F.col("n_grams"), 6),
        )
    )



def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_id: int | None = None,
    allow_unbounded: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold over a bounded id
    range (brute-force n², the verification primitive — the scale path is
    ``embedding_lsh_pairs``, which buckets by sign-LSH so only
    near-in-hash pairs are compared).

    Unbounded-input guard: with ``max_id=None`` this is an all-pairs
    cross join — quadratic in the table. Inputs beyond ~10⁴ rows raise
    (pass ``allow_unbounded=True`` to override knowingly); the check is a
    capped ``limit(N+1).count()``, cheap relative to the n² that follows."""
    from .simsearch import drop_degenerate_vectors

    base = drop_degenerate_vectors(df, vec_col)
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    elif not allow_unbounded:
        n = base.limit(_UNBOUNDED_PAIRS_CAP + 1).count()
        if n > _UNBOUNDED_PAIRS_CAP:
            raise ValueError(
                f"embedding_cosine_pairs without max_id is all-pairs O(n²) and the "
                f"input exceeds {_UNBOUNDED_PAIRS_CAP} rows — use embedding_lsh_pairs "
                "(sign-LSH bucketed, the scale path) or pass allow_unbounded=True / a max_id bound"
            )
    v = base.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    v = v.withColumn("n", norm)
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(F.zip_with("a.v", "b.v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot / (F.col("a.n") * F.col("b.n")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    bucket_hamming: int = 1,
    max_id: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Sign-LSH-bucketed embedding near-dup pairs — the 100 TB path that
    ``embedding_cosine_pairs`` verifies. ``max_bucket`` = the hot-bucket
    guard (docs in sign-buckets larger than this are excluded from
    candidate generation; see the inline comment and minhash_lsh_pairs).

    Candidate pairs are pairs whose sign-LSH bucket ids (``bits`` seeded
    random hyperplanes, simsearch.make_bucketizer) differ in at most
    ``bucket_hamming`` bits; only candidates get the exact cosine verify.
    Shape mirrors dd3 (MinHash) and dd4 (SimHash): the candidate join
    shuffles (id, bucket) ONLY — vectors are re-joined by id for the
    verify, never multiplied through the explode. Each row explodes to
    ``Σ C(bits, 0..bucket_hamming)`` probe buckets (9 at the 8/1 default)
    and a qualifying pair matches on exactly ONE mask (the xor of its two
    buckets), so no distinct pass is needed.

    Recall economics (fixed seed ⇒ deterministic, pinned in tests): a pair
    at cosine t collides on one hyperplane with p = 1 - acos(t)/π, so
    P[hamming ≤ 1] at t=0.9, bits=8 is ~0.67 — the standard single-table
    LSH trade; multiple seeds (union of tables) buy recall linearly in
    cost, exactly like MinHash bands.

    ``bucket_hamming >= bits`` makes EVERY pair a candidate: output equals
    brute force exactly while the bucketize → explode → bucket-join → verify
    machinery still executes — the verification configuration (the e2/dd4
    exact-oracle-by-parameter pattern)."""
    from .simsearch import drop_degenerate_vectors, make_bucketizer

    base = drop_degenerate_vectors(df, vec_col)
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    head = base.select(vec_col).head()
    if head is None:  # empty input → empty pair frame with the right schema
        return base.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"), F.lit(0.0).alias("cosine")
        ).limit(0)
    bucketize = make_bucketizer(len(head[0]), bits, seed)
    v = base.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("_b", bucketize(F.col("v")))
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    v = v.withColumn("n", norm)
    r = min(bucket_hamming, bits)
    masks = [m for m in range(1 << bits) if bin(m).count("1") <= r]
    ids = v.select("id", "_b")
    if max_bucket is not None:
        # hot-bucket guard: docs whose sign-bucket holds > max_bucket members
        # do not participate in candidate generation at all (either side) —
        # mega-buckets are near-identical boilerplate mass, the quadratic
        # killer; see minhash_lsh_pairs for the recall trade and remedy
        ok = (
            ids.groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") <= max_bucket)
            .select("_b")
        )
        ids = ids.join(ok, "_b")
    probes = ids.select(
        F.col("id").alias("id_a"),
        F.explode(F.array(*[F.col("_b").bitwiseXOR(F.lit(m)) for m in masks])).alias("_pb"),
    )
    cand = (
        probes.join(ids.select(F.col("id").alias("id_b"), F.col("_b").alias("_pb")), "_pb")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("_va"), F.col("n").alias("_na"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"), F.col("n").alias("_nb"))
    dot = F.aggregate(F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(dot / (F.col("_na") * F.col("_nb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _simhash_with(df: DataFrame, h, bits: int, text_col: str, id_col: str) -> DataFrame:
    """Shared SimHash machinery: explode tokens → per-token hash expression
    ``h`` → per-bit vote sums as ``bits`` aggregate columns (map-side
    partial sums, one shuffle keyed by id) → reassemble from vote signs.
    Shuffle payload is ``bits`` longs per doc regardless of document length
    — the 100 TB-safe shape. Docs with no tokens hash to 0."""
    from ..functions.text import ws_tokens

    ids = df.select(F.col(id_col).alias("id"))
    # explode(ws_tokens(...)) ≡ the old explode(split).filter(tok != "")
    # row-for-row (explode of the pre-filtered array skips empties the same
    # way), but tokenization now goes through the ONE shared definition
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(text_col)).alias("tok"),
    )
    votes = toks.groupBy("id").agg(
        *[
            F.sum(F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    # bit j set iff vote sum > 0; shiftleft(1L, 63) is Long.MIN_VALUE — the
    # sign bit — so even bit 63 lands correctly in two's complement
    acc = F.lit(0).cast("long")
    for j in range(bits):
        acc = acc + F.when(F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
    hashed = votes.select("id", acc.alias("simhash"))
    return ids.join(hashed, "id", "left").select("id", F.coalesce("simhash", F.lit(0)).alias("simhash"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc via xxhash64 token hashes — pure JVM codegen,
    the default/fastest variant."""
    return _simhash_with(df, F.xxhash64(F.col("tok")), 64, text_col, id_col)


def simhash_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash whose token hash is the first 15 hex chars of
    md5(token) — bit-for-bit reproducible OUTSIDE Spark (DuckDB:
    ('0x' || substr(md5(tok),1,15))::BIGINT), so the whole operator gets an
    exact cross-engine oracle. 15 hex chars = 60 bits keeps the value
    inside a signed 64-bit long in both engines."""
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    return _simhash_with(df, h, 60, text_col, id_col)


def _block_specs(bits: int, n_blocks: int) -> list[tuple[int, int]]:
    """Split ``bits`` into ``n_blocks`` disjoint nearly-equal (start, width)
    blocks covering every bit exactly once."""
    bounds = [round(i * bits / n_blocks) for i in range(n_blocks + 1)]
    return [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_blocks)]


def near_pairs_from_simhash(
    sh: DataFrame, bits: int, max_hamming: int, max_bucket: int | None = None
) -> DataFrame:
    """Candidate pairs from a (id, simhash) frame via block-equality LSH,
    verified by exact popcount Hamming distance.

    Pigeonhole soundness: with ``n_blocks = max_hamming + 1`` disjoint
    blocks, a pair differing in ≤ max_hamming bits cannot differ in every
    block, so it shares at least one block verbatim — recall is exact at
    the configured threshold for ANY max_hamming < bits (round 1 hardcoded
    4×16-bit blocks, which only guarantees hamming ≤ 3; calls at
    max_hamming=8 silently missed pairs whose 4-8 flipped bits spread
    2-per-block).

    ``max_bucket``: hot-block guard — identical-simhash mega-groups
    (boilerplate; every member shares EVERY block) generate B² candidates
    per block; block values held by more than ``max_bucket`` docs are
    excluded from candidate generation. Same recall trade and same
    run-exact-dedup-first remedy as minhash_lsh_pairs; None (default)
    keeps the exact pigeonhole recall the oracle entries rely on."""
    n_blocks = max_hamming + 1
    if n_blocks > bits:
        raise ValueError(f"max_hamming={max_hamming} needs {n_blocks} blocks > {bits} bits")
    specs = _block_specs(bits, n_blocks)
    blocks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("simhash", start).bitwiseAND(F.lit((1 << width) - 1)).alias("bv"),
                    )
                    for b, (start, width) in enumerate(specs)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.blk", "bk.bv")
    if max_bucket is not None:
        ok = (
            blocks.groupBy("blk", "bv")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") <= max_bucket)
            .select("blk", "bv")
        )
        blocks = blocks.join(ok, ["blk", "bv"])
    a, b = blocks.alias("a"), blocks.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # order matters at scale: the Hamming verify is a cheap join-side
    # expression, the pair-dedup is a SHUFFLE — filtering first means only
    # true near-pairs (× the few blocks they co-occur in) reach the
    # distinct, not every block collision (clustered corpora generate
    # ~100× more candidates than results; measured 9s → 2s at sf0.1)
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.bv") == F.col("b.bv")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    variant: str = "xxhash64",
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: block-equality candidate join (block count
    derived from the threshold — see near_pairs_from_simhash) + exact
    Hamming verify. ``variant='md5'`` uses the 60-bit md5 simhash, which is
    bit-for-bit reproducible in DuckDB so the whole operator (hash → bit
    votes → candidate join → Hamming filter) gets an exact cross-engine
    oracle; ``'xxhash64'`` is the faster default for production use.
    ``max_bucket`` = the hot-block guard (see near_pairs_from_simhash)."""
    if variant == "md5":
        sh, bits = simhash_md5(df, text_col, id_col), 60
    else:
        sh, bits = simhash(df, text_col, id_col), 64
    return near_pairs_from_simhash(sh, bits, max_hamming, max_bucket=max_bucket)


def incremental_dedup(
    batch: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an INCOMING batch against an already-ingested corpus — the
    shape exact dedup actually takes at 100 TB, where the historical
    fingerprint index exists and each ingestion wave only anti-joins
    against it (re-fingerprinting the full corpus per wave would be a
    full-table scan per day).

    ``seen_fingerprints`` is a one-column frame (``fp`` BIGINT) — the
    persisted index, e.g. yesterday's output of this same function
    unioned in. Two steps, both single-shuffle: (1) within-batch exact
    dedup (min-id survivor per fingerprint, ``exact_dedup``'s rule), then
    (2) ``left_anti`` against the index on the same key — Catalyst plans
    both over one hash partitioning of ``fp``, and AQE picks
    broadcast-anti when the day's index delta is small. The fingerprint is
    ``md5_60bit`` over whitespace-normalized lowercase text (the
    engine-portable hash), so the index stays 8 bytes/doc — 10^12 docs ≈
    8 TB index, itself partitionable by fp range.

    Columns: doc_id, fp (the survivors to ingest; append their fps to the
    index for the next wave).
    """
    from ..functions.text import md5_60bit, normalize_ws

    fps = batch.select(F.col(id_col), md5_60bit(normalize_ws(text_col)).alias("fp"))
    survivors = fps.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return survivors.join(
        seen_fingerprints.select("fp").distinct(), "fp", "left_anti"
    ).select(id_col, "fp")


def twin_recall_gate(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    strong_hamming: int = 1,
    min_recall_pct: int = 90,
) -> DataFrame:
    """Cross-family recall contract between two near-dup pair frames (the
    gx1 driver gate; the e2y/e3y measured-quality convention applied to
    hash twins). Input frames carry (id_a, id_b, hamming) from two hash
    families over the SAME corpus (e.g. md5 simhash — the DuckDB-oracled
    family — vs the xxhash64 production family).

    Contract: each family must re-detect >= ``min_recall_pct``% of the
    other's STRONG pairs (hamming <= ``strong_hamming``) at its own
    working threshold. Zero-miss is deliberately NOT the contract: the
    sf0.1 rehearsal (BENCH/rehearsal_r5_sf01.json) measured ~5% legitimate
    cross-family divergence on strong pairs (5/98 and 4/102) — different
    fingerprint projections disagree near any threshold — while a broken
    twin (wrong bit votes, wrong block derivation, wrong token hash
    width, misaligned ids) misses essentially all of them
    (tests/test_gates.py plants exactly that and asserts the gate trips).

    One row out: ``a_pairs`` and ``a_strong`` (exact counts, oracle-
    pinnable when family A is the md5 one), ``b_recall_ok`` (B re-detects
    A's strong pairs), ``a_recall_ok`` (symmetric) — booleans as BIGINT,
    computed with pure integer arithmetic (missed*100 <= strong*(100-p)).
    Five 1-row aggregates cross-joined; every join ships id pairs only.
    Both pair frames are persisted first: each is referenced three times
    in the one plan (count, strong count, anti-join side) and the differing
    hamming filters defeat exchange reuse — without the persist the
    expensive pair-generation lineage (token explode, bit votes, block
    self-join) would execute up to 3x per family. The cached frames are
    small (id, id, hamming per near-dup pair), and the gate OWNS their
    lifetime: the single result row is materialized eagerly, both frames
    unpersisted, and a local one-row frame returned — a long-lived session
    running the gate repeatedly (bench best-of-2, rehearsals, the driver
    window) must not accumulate orphaned cached blocks.
    """
    pairs_a = pairs_a.select("id_a", "id_b", "hamming").persist()
    pairs_b = pairs_b.select("id_a", "id_b", "hamming").persist()
    a_ids = pairs_a.select("id_a", "id_b")
    b_ids = pairs_b.select("id_a", "id_b")
    a_strong = pairs_a.filter(F.col("hamming") <= strong_hamming).select("id_a", "id_b")
    b_strong = pairs_b.filter(F.col("hamming") <= strong_hamming).select("id_a", "id_b")
    n_a = a_ids.agg(F.count(F.lit(1)).cast("long").alias("a_pairs"))
    n_as = a_strong.agg(F.count(F.lit(1)).cast("long").alias("a_strong"))
    n_bs = b_strong.agg(F.count(F.lit(1)).cast("long").alias("_b_strong"))
    miss_b = a_strong.join(b_ids, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("_miss_b")
    )
    miss_a = b_strong.join(a_ids, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("_miss_a")
    )
    gap = 100 - min_recall_pct
    row = n_a.crossJoin(n_as).crossJoin(miss_b).crossJoin(n_bs).crossJoin(miss_a)
    out = row.select(
        "a_pairs",
        "a_strong",
        (F.col("_miss_b") * 100 <= F.col("a_strong") * gap).cast("long").alias("b_recall_ok"),
        (F.col("_miss_a") * 100 <= F.col("_b_strong") * gap).cast("long").alias("a_recall_ok"),
    )
    materialized = out.collect()  # exactly one row
    pairs_a.unpersist()
    pairs_b.unpersist()
    return pairs_a.sparkSession.createDataFrame(materialized, out.schema)
