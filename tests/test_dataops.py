"""Training-data operator tests: dedup strategies recover planted
duplicates, ANN agrees with brute force on its bucket, multimodal plumbing
preserves schema/batch shape and determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from otel_kafka_pg_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from otel_kafka_pg_spark.operators.multimodal import FEATURE_DIM, extract_features, synth_media
from otel_kafka_pg_spark.operators.simsearch import cosine_topk, lsh_bucket_topk

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0 (modulo nothing)
        (2, BASE + " extra tail words appended here"),  # near-dup of 0
        (3, "completely different content about spark query planning engines"),
        (4, "  " + BASE.upper() + "  "),  # whitespace/case variant → same fingerprint
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_groups_normalized_variants(spark):
    out = {r["keep_id"]: r["n_dups"] for r in exact_dedup(_docs(spark)).collect()}
    # 0, 1 and 4 normalize (lower + whitespace collapse) to one fingerprint
    assert out[0] == 3
    assert out[2] == 1 and out[3] == 1


def test_ngram_jaccard_finds_planted_near_dup(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # the near-dup survives the 0.5 threshold
    assert not any(3 in p for p in pairs)  # unrelated doc pairs with nothing


def test_minhash_lsh_recovers_bruteforce_pairs(spark):
    # at threshold 0.5 the banded-LSH candidate set must contain every true
    # pair (recall check vs the exact quadratic baseline)
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(_docs(spark), threshold=0.5).collect()}
    assert exact <= lsh or exact == lsh
    # and LSH never fabricates pairs below threshold (it verifies exactly)
    assert lsh <= {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}


def test_hashed_shingles_jaccard_equals_string_shingles(spark):
    """The hashed-shingle hot path must give the SAME Jaccard as the string
    shingles on real data (cardinalities preserved — a difference needs a
    64-bit in-doc gram collision)."""
    from otel_kafka_pg_spark.functions.text import hashed_shingles, word_shingles

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(200)
    both = d.select(
        F.size(word_shingles("text")).alias("ns"),
        F.size(hashed_shingles("text")).alias("nh"),
    )
    assert both.filter(F.col("ns") != F.col("nh")).count() == 0
    # pairwise Jaccard agreement on a bounded candidate set
    s = d.select(F.col("doc_id").alias("id"), word_shingles("text").alias("a"), hashed_shingles("text").alias("b"))
    pairs = s.alias("x").join(s.alias("y"), F.col("x.id") < F.col("y.id"))
    js = F.size(F.array_intersect("x.a", "y.a")) / F.size(F.array_union("x.a", "y.a"))
    jh = F.size(F.array_intersect("x.b", "y.b")) / F.size(F.array_union("x.b", "y.b"))
    assert pairs.filter(F.round(js, 6) != F.round(jh, 6)).count() == 0


def test_simhash_near_pairs_flags_duplicates_only(spark):
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(_docs(spark), max_hamming=10).collect()}
    assert got[(0, 1)] == 0  # identical docs → identical simhash
    assert (0, 4) in got  # case variant: lowercased tokens → hamming 0
    assert not any(3 in p for p in got)


def test_simhash_candidate_recall_spread_bits(spark):
    """The round-1 recall bug: 4 fixed 16-bit blocks only guarantee recall
    for hamming ≤ 3. Plant pairs whose 4-8 flipped bits spread across every
    16-bit block (2 per block) — no 16-bit block is equal, so the old code
    silently dropped them; the threshold-derived block scheme must find
    every one. Exhaustive cross-check vs brute-force Hamming."""
    from itertools import combinations

    from otel_kafka_pg_spark.operators.dedup import near_pairs_from_simhash

    base = 0x123456789ABCDEF0
    flips = [
        base ^ 0x0003_0003_0003_0003,  # 8 bits, 2 per 16-bit block
        base ^ 0x0001_0001_0001_0001,  # 4 bits, 1 per block
        base ^ 0x0000_0000_0000_00FF,  # 8 bits, one block only
        base ^ 0x8001_8001_8001_8001,  # 8 bits incl. the sign bit
        base,  # identical twin
        0x0F0F0F0F0F0F0F0F,  # far away (hamming >> 8)
    ]
    vals = [base, *flips]
    signed = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]  # two's-complement long
    sh = spark.createDataFrame(list(enumerate(signed)), "id int, simhash long")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in near_pairs_from_simhash(sh, 64, 8).collect()}
    exp = {
        (i, j): bin(vals[i] ^ vals[j]).count("1")
        for i, j in combinations(range(len(vals)), 2)
        if bin(vals[i] ^ vals[j]).count("1") <= 8
    }
    assert got == exp  # exact recall AND no fabricated pairs
    assert (0, 1) in exp and (0, 4) in exp  # the spread-bit pairs old code missed


def test_simhash_md5_variant_matches_xxhash_pair_structure(spark):
    # md5 variant (the oracle-portable one) flags the same planted dups
    got = {(r["id_a"], r["id_b"]) for r in simhash_near_pairs(_docs(spark), max_hamming=8, variant="md5").collect()}
    assert (0, 1) in got and (0, 4) in got
    assert not any(3 in p for p in got)


def test_simhash_near_pairs_rejects_impossible_threshold(spark):
    import pytest as _pytest

    from otel_kafka_pg_spark.operators.dedup import near_pairs_from_simhash

    sh = spark.createDataFrame([(0, 1)], "id int, simhash long")
    with _pytest.raises(ValueError):
        near_pairs_from_simhash(sh, 64, 64)


def test_embedding_cosine_pairs_threshold(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in embedding_cosine_pairs(df, threshold=0.9).collect()}
    assert list(got) == [(0, 1)]
    assert got[(0, 1)] > 0.99


def test_embedding_cosine_pairs_unbounded_raises_on_large_input(spark):
    from otel_kafka_pg_spark.operators.dedup import _UNBOUNDED_PAIRS_CAP

    big = spark.range(_UNBOUNDED_PAIRS_CAP + 1).selectExpr(
        "id AS vec_id", "array(1.0, 2.0) AS embedding"
    )
    with pytest.raises(ValueError, match="embedding_lsh_pairs"):
        embedding_cosine_pairs(big)
    # the three escape hatches still work: bound, explicit opt-in, small input
    assert embedding_cosine_pairs(big, max_id=3).count() == 3
    small = big.limit(5)
    assert embedding_cosine_pairs(small).count() == 10


def _emb(spark, n=200, d=8, seed=11):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d).astype("float32")
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>"), m


def test_embedding_lsh_pairs_full_hamming_equals_brute_force(spark):
    """The dd5b verification identity: bucket_hamming = bits makes every
    pair a candidate, so the bucketed operator's output must equal the
    brute-force primitive exactly (ids AND rounded cosines)."""
    from otel_kafka_pg_spark.operators.dedup import embedding_lsh_pairs

    df, _ = _emb(spark, n=80)
    brute = {(r["id_a"], r["id_b"], r["cosine"]) for r in embedding_cosine_pairs(df, threshold=0.3).collect()}
    full = {(r["id_a"], r["id_b"], r["cosine"]) for r in embedding_lsh_pairs(df, threshold=0.3, bits=4, bucket_hamming=4).collect()}
    assert brute and full == brute


def test_embedding_lsh_pairs_pruned_recovers_planted_near_dups(spark):
    """Production config (bits=8, bucket_hamming=1) on PLANTED near-dups:
    cosine ≈0.999 pairs collide per-hyperplane with p = 1-acos(t)/π ≈ 0.99,
    so P[hamming ≤ 1] ≈ 0.997 per pair — at a fixed seed, all planted pairs
    must surface, and no pair below threshold may be fabricated."""
    from otel_kafka_pg_spark.operators.dedup import embedding_lsh_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype("float64")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant 10 near-dups: id 100+i = tiny perturbation of id i
    for i in range(10):
        rows.append((100 + i, [float(x) for x in base[i] + 0.01 * rng.randn(16)]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_lsh_pairs(df, threshold=0.95, bits=8, bucket_hamming=1).collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= got
    brute = {(r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(df, threshold=0.95).collect()}
    assert got <= brute  # exact verify: no fabricated pairs


def test_embedding_lsh_pairs_empty_input(spark):
    from otel_kafka_pg_spark.operators.dedup import embedding_lsh_pairs

    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    out = embedding_lsh_pairs(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_cosine_topk_matches_numpy(spark):
    df, m = _emb(spark)
    q = [float(x) for x in m[0]]
    got = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    sims = (m @ m[0]) / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[0]))
    exp = list(np.argsort(np.round(-sims, 4), kind="stable")[:5])
    assert got[0] == 0  # the query vector itself is its own nearest neighbor
    assert got == [int(x) for x in exp]


def test_lsh_ann_subset_of_bucket_and_self_found(spark):
    df, m = _emb(spark)
    q = [float(x) for x in m[0]]
    ann = [r["vec_id"] for r in lsh_bucket_topk(df, q, k=5, bits=4).collect()]
    assert ann[0] == 0  # query's own bucket contains the query vector
    brute = [r["vec_id"] for r in cosine_topk(df, q, k=200).collect()]
    assert set(ann) <= set(brute)


def test_lsh_ann_multiprobe_recall(spark):
    """Multi-probe recall vs brute force at a fixed seed (the IVF-style
    gate): single-bucket probing recalls poorly by construction; adding
    the closest-margin neighbor bucket must lift recall@10 to ≥ 0.9 at
    test scale while still scanning ~2/16 of the buckets."""
    df, m = _emb(spark)
    q = [float(x) for x in m[0]]
    brute = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    single = {r["vec_id"] for r in lsh_bucket_topk(df, q, k=10, bits=4, n_probe=1).collect()}
    multi = {r["vec_id"] for r in lsh_bucket_topk(df, q, k=10, bits=4, n_probe=2).collect()}
    recall_single = len(single & brute) / len(brute)
    recall_multi = len(multi & brute) / len(brute)
    assert recall_multi >= 0.9
    assert recall_multi > recall_single  # the probe is what buys the recall


def test_lsh_probe_buckets_deterministic_and_distinct(spark):
    from otel_kafka_pg_spark.operators.simsearch import probe_buckets

    q = [0.3, -1.2, 0.7, 0.1, 2.0, -0.5, 0.9, -0.2]
    b1 = probe_buckets(q, bits=4, seed=42, n_probe=3)
    b2 = probe_buckets(q, bits=4, seed=42, n_probe=3)
    assert b1 == b2  # seeded → identical on driver and every executor
    assert len(set(b1)) == 3  # each probe is a distinct bucket
    assert all(0 <= b < 16 for b in b1)


def test_probe_buckets_multibit_reaches_past_single_flips(spark):
    """The round-4 multi-probe fix: single-bit flips cap the probe set at
    bits+1 buckets; the flip-cost ranking must keep producing DISTINCT new
    buckets beyond that (multi-bit masks), own bucket always first, and a
    full-probe request must enumerate every bucket exactly once."""
    from otel_kafka_pg_spark.operators.simsearch import probe_buckets

    q = [0.3, -1.2, 0.7, 0.1, 2.0, -0.5, 0.9, -0.2]
    twelve = probe_buckets(q, bits=4, seed=42, n_probe=12)
    assert len(set(twelve)) == 12  # old implementation plateaued at 5
    assert twelve[0] == probe_buckets(q, bits=4, seed=42, n_probe=1)[0]  # own bucket first
    assert sorted(probe_buckets(q, bits=4, seed=42, n_probe=16)) == list(range(16))
    # prefix-stability: n_probe=k is a prefix of n_probe=k+1 (ranking is total)
    assert twelve[:6] == probe_buckets(q, bits=4, seed=42, n_probe=6)
    # large-bits path (pair enumeration): still distinct, still cost-ranked
    q16 = list(np.random.RandomState(3).randn(16))
    b = probe_buckets(q16, bits=16, seed=42, n_probe=20)
    assert len(set(b)) == 20 and all(0 <= x < (1 << 16) for x in b)
    # large-bits + n_probe beyond the 1+bits+C(bits,2) pair pool: the
    # enumeration must extend to higher flip orders and return exactly
    # n_probe distinct buckets (the pre-fix form silently returned 137)
    big = probe_buckets(q16, bits=16, seed=42, n_probe=500)
    assert len(big) == 500 and len(set(big)) == 500


def test_multimodal_features_schema_and_determinism(spark):
    feats = extract_features(synth_media(spark, n=30))
    assert [f.name for f in feats.schema.fields] == ["media_id", "kind", "n_bytes", "features"]
    assert "payload" not in feats.columns  # binary never carried past the stage
    a = {r["media_id"]: r["features"] for r in feats.collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(synth_media(spark, n=30)).collect()}
    assert a == b  # pure function of payload content
    assert all(len(v) == FEATURE_DIM for v in a.values())


def test_multimodal_decode_stub_raises(spark):
    from otel_kafka_pg_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png")


def test_multimodal_binary_column_prunable(spark):
    # scale guard: selecting only metadata must not read the payload column
    media = synth_media(spark, n=10)
    import os
    import tempfile

    d = tempfile.mkdtemp()
    media.write.mode("overwrite").parquet(os.path.join(d, "m"))
    plan = (
        spark.read.parquet(os.path.join(d, "m"))
        .select("media_id", "kind")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan


def test_asof_join_semantics(spark):
    import datetime as dt

    from otel_kafka_pg_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("u1", t(5), "a"), ("u1", t(10), "b"), ("u1", t(2), "c"), ("u2", t(7), "d")],
        "user_id string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", t(3), 30.0), ("u1", t(10), 100.0), ("u2", t(9), 90.0)],
        "user_id string, ts timestamp, v double",
    )
    out = {r["tag"]: r["v"] for r in asof_join(left, right, "user_id", ["v"]).collect()}
    assert out["c"] is None  # ts=2: no right row at or before
    assert out["a"] == 30.0  # ts=5: latest prior is ts=3
    assert out["b"] == 100.0  # ts=10: equal timestamp is INCLUSIVE
    assert out["d"] is None  # u2 ts=7: right row is at ts=9 (future)

    # precondition guard: a value_col already on the left frame must raise
    # (silently selecting it twice would poison the last(ignorenulls) fill)
    left_clash = left.withColumnRenamed("tag", "v")
    with pytest.raises(ValueError, match="left frame collide"):
        asof_join(left_clash, right, "user_id", ["v"])
    # internal marker names are reserved too (would be silently overwritten)
    with pytest.raises(ValueError, match="left frame collide"):
        asof_join(left.withColumnRenamed("tag", "_ats"), right, "user_id", ["v"])


def test_asof_join_null_semantics_match_duckdb(spark):
    """DuckDB-ASOF parity on the NULL cases a per-column ignorenulls fill
    gets wrong: (a) a matched right row with a NULL value fills NULL, never
    a stale older value; (b) multi-column fills never tear across different
    right rows; (c) right rows with a NULL timestamp are never matched."""
    import datetime as dt

    from otel_kafka_pg_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [("u1", t(6), "x"), ("u3", t(5), "y")], "user_id string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("u1", t(1), 7.0, 100.0), ("u1", t(5), None, 200.0), ("u3", None, 9.0, 9.0)],
        "user_id string, ts timestamp, a double, b double",
    )
    out = {r["tag"]: (r["a"], r["b"]) for r in asof_join(left, right, "user_id", ["a", "b"]).collect()}
    # the t=5 row wins the match: its NULL a fills NULL (not the stale 7.0),
    # and both columns come from the SAME right row
    assert out["x"] == (None, 200.0)
    # a NULL right timestamp never matches (l.ts >= NULL is never true)
    assert out["y"] == (None, None)


def test_merge_attrs_null_map_degrades_to_other_side(spark):
    """A NULL attrs map (e.g. a raw left-join miss, without the pipeline's
    coalesce) must degrade the merge to the other side's entries — not
    NULL the whole attributes column."""
    from otel_kafka_pg_spark.functions.attrs import canonical_json, merge_attrs

    df = spark.createDataFrame([("v",)], "k string").select(
        F.create_map(F.lit("rk"), F.col("k")).alias("rec"),
        F.lit(None).cast("map<string,string>").alias("res"),
    )
    for wins in (True, False):
        got = df.select(
            canonical_json(merge_attrs(F.col("rec"), F.col("res"), resource_wins=wins)).alias("j")
        ).collect()[0]["j"]
        assert got == '{"rk":"v"}'


def test_multimodal_frame_sample(spark):
    from otel_kafka_pg_spark.operators.multimodal import frame_sample, synth_media

    media = synth_media(spark, n=12)  # kinds cycle image/audio/video → 4 videos
    frames = frame_sample(media, frame_bytes=64, every_k=2).collect()
    assert all(len(r["frame"]) == 64 for r in frames)
    assert all(r["frame_idx"] % 2 == 0 for r in frames)  # every 2nd frame only
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    # only video rows survive (media_id % 3 == 2 in synth_media's cycle)
    assert all(mid % 3 == 2 for mid in by_media)
    assert len(by_media) == 4


def test_ivf_ann_recall_and_self(spark):
    from otel_kafka_pg_spark.operators.simsearch import ivf_topk

    df, m = _emb(spark)
    q = [float(x) for x in m[0]]
    ann = [r["vec_id"] for r in ivf_topk(df, q, k=5, n_centroids=4, n_probe=2).collect()]
    assert ann[0] == 0  # the query's own cell is always probed first
    brute = [r["vec_id"] for r in cosine_topk(df, q, k=200).collect()]
    assert set(ann) <= set(brute)
    # determinism: same seed → same result
    again = [r["vec_id"] for r in ivf_topk(df, q, k=5, n_centroids=4, n_probe=2).collect()]
    assert ann == again


def test_winnowing_shared_substring_guarantee(spark):
    from otel_kafka_pg_spark.functions.text import winnowing_fingerprints

    common = "this exact shared passage appears verbatim in both documents"
    rows = [
        (0, "intro words before. " + common + " and a different ending here"),
        (1, "totally other opening text! " + common + " closing remarks differ"),
        (2, "nothing in common with either of the previous two entries at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {r["doc_id"]: set(r["fp"]) for r in df.select("doc_id", winnowing_fingerprints("text").alias("fp")).collect()}
    # winnowing guarantee: a shared substring of length >= k+window-1 yields
    # at least one shared fingerprint
    assert fps[0] & fps[1]
    # overlap with the unrelated doc is far smaller than between 0 and 1
    assert len(fps[0] & fps[1]) > 3 * len(fps[0] & fps[2])


def test_asof_join_randomized_vs_pandas_merge_asof(spark):
    import pandas as pd

    from otel_kafka_pg_spark.operators.asof import asof_join

    rng = np.random.RandomState(77)
    n_left, n_right = 400, 120
    left = pd.DataFrame(
        {
            "user_id": [f"u{int(x)}" for x in rng.randint(0, 12, n_left)],
            "ts": pd.to_datetime(rng.randint(0, 100000, n_left), unit="s"),
            "row_id": np.arange(n_left),
        }
    )
    right = (
        pd.DataFrame(
            {
                "user_id": [f"u{int(x)}" for x in rng.randint(0, 12, n_right)],
                "ts": pd.to_datetime(rng.randint(0, 100000, n_right), unit="s"),
                "v": rng.randn(n_right).round(4),
            }
        )
        .drop_duplicates(["user_id", "ts"])  # asof requires unique (key, ts)
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    ).set_index("row_id")["v"]

    ldf = spark.createDataFrame(left, "user_id string, ts timestamp, row_id long")
    rdf = spark.createDataFrame(right, "user_id string, ts timestamp, v double")
    got = {r["row_id"]: r["v"] for r in asof_join(ldf, rdf, "user_id", ["v"]).collect()}
    for rid, v in exp.items():
        g = got[rid]
        if pd.isna(v):
            assert g is None, rid
        else:
            assert g == pytest.approx(v), rid


# ---------------------------------------------------------------------------
# Hot-bucket (boilerplate-skew) guard: max_bucket on the three LSH self-joins
# ---------------------------------------------------------------------------


def _boilerplate_corpus(spark):
    """200 byte-identical boilerplate docs (every LSH bucket they touch is a
    mega-bucket) + one planted near-dup pair of distinct prose + one loner."""
    boiler = [(i, "this website uses cookies to improve your experience accept all") for i in range(200)]
    pair = [
        (900, "the quick brown fox jumps over the lazy dog near the river bank"),
        (901, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    loner = [(950, "completely unrelated text about astrophysics and neutron stars")]
    return spark.createDataFrame(boiler + pair + loner, "doc_id int, text string")


def test_minhash_max_bucket_skips_boilerplate_keeps_planted_pair(spark):
    docs = _boilerplate_corpus(spark)
    capped = {(r["id_a"], r["id_b"]) for r in
              minhash_lsh_pairs(docs, threshold=0.5, max_bucket=50).collect()}
    assert (900, 901) in capped                       # real near-dup survives
    assert not any(a < 200 and b < 200 for a, b in capped)  # no quadratic mass
    # uncapped control: the boilerplate block IS quadratic (199·200/2 pairs)
    uncapped = minhash_lsh_pairs(docs, threshold=0.5).count()
    assert uncapped >= 199 * 200 // 2


def test_simhash_max_bucket_skips_boilerplate_keeps_planted_pair(spark):
    docs = _boilerplate_corpus(spark)
    capped = {(r["id_a"], r["id_b"]) for r in
              simhash_near_pairs(docs, max_hamming=8, max_bucket=50).collect()}
    assert (900, 901) in capped
    assert not any(a < 200 and b < 200 for a, b in capped)
    uncapped = simhash_near_pairs(docs, max_hamming=8).count()
    assert uncapped >= 199 * 200 // 2


def test_embedding_lsh_max_bucket_skips_hot_sign_bucket(spark):
    from otel_kafka_pg_spark.operators.dedup import embedding_lsh_pairs

    # 150 identical vectors (one sign-bucket) + a planted near-pair elsewhere
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    hot = [(i, [float(x) for x in base]) for i in range(150)]
    v1 = rng.randn(8)
    v2 = v1 + 0.01 * rng.randn(8)
    if float(np.dot(v1, base)) > 0:  # keep the pair out of the hot bucket's halfspace mix
        v1, v2 = -v1, -v2
    pair = [(900, [float(x) for x in v1]), (901, [float(x) for x in v2])]
    df = spark.createDataFrame(hot + pair, "vec_id int, embedding array<double>")
    capped = {(r["id_a"], r["id_b"]) for r in
              embedding_lsh_pairs(df, threshold=0.99, bits=4, bucket_hamming=0,
                                  max_bucket=50).collect()}
    assert not any(a < 150 and b < 150 for a, b in capped)
    assert (900, 901) in capped
    uncapped = embedding_lsh_pairs(df, threshold=0.99, bits=4, bucket_hamming=0).count()
    assert uncapped >= 149 * 150 // 2


def test_paragraph_dedup_first_occurrence_survives(spark):
    from otel_kafka_pg_spark.operators.dedup import paragraph_dedup

    sep = "\n\n"
    boiler = "subscribe to our newsletter"
    rows = [
        (0, sep.join(["unique alpha", boiler, "unique beta"])),
        (1, sep.join([boiler, "unique gamma"])),          # boiler repeats -> cut
        (2, sep.join(["  " + boiler + "  ", "delta"])),   # trimmed match -> cut
        (3, boiler),                                      # fully boilerplate -> ''
        (4, sep.join(["solo", "", "after-blank"])),       # blank para kept as-is
        (5, sep.join(["solo2", "", "after-blank2"])),     # blank NOT deduped across docs
    ]
    got = {r["doc_id"]: r.asDict() for r in
           paragraph_dedup(spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert got[0]["clean_text"] == rows[0][1] and got[0]["n_removed"] == 0
    assert got[1]["clean_text"] == "unique gamma" and got[1]["n_removed"] == 1
    assert got[2]["clean_text"] == "delta" and got[2]["n_removed"] == 1
    assert got[3]["clean_text"] == "" and got[3]["n_kept"] == 0 and got[3]["n_removed"] == 1
    assert got[4]["clean_text"] == rows[4][1]  # blank slot preserved in place
    assert got[5]["clean_text"] == rows[5][1]
    assert len(got) == 6  # every input doc appears exactly once


def test_paragraph_dedup_order_and_within_doc_repeat(spark):
    from otel_kafka_pg_spark.operators.dedup import paragraph_dedup

    sep = "\n\n"
    # same para twice WITHIN one doc: first position survives, order stable
    rows = [(7, sep.join(["z-late", "dup", "a-early", "dup"]))]
    got = paragraph_dedup(spark.createDataFrame(rows, "doc_id long, text string")).head()
    assert got["clean_text"] == sep.join(["z-late", "dup", "a-early"])
    assert got["n_kept"] == 3 and got["n_removed"] == 1


def test_importance_ratio_ranks_target_like_docs_higher(spark):
    from otel_kafka_pg_spark.operators.corpus import importance_ratio

    # target vocabulary {spark shuffle join}; off-target {valse tango polka}
    rows = [
        (0, "spark shuffle join spark shuffle"),
        (1, "valse tango polka valse tango"),
        (2, "spark valse"),  # mixed
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = corpus.filter("doc_id = 0")
    got = {r["doc_id"]: r.asDict() for r in importance_ratio(corpus, target).collect()}
    assert got[0]["ratio"] > got[2]["ratio"] > got[1]["ratio"]
    assert got[0]["n_toks"] == 5 and got[1]["n_toks"] == 5 and got[2]["n_toks"] == 2
    # raw side counts every doc's tokens; target side only doc 0's
    assert got[1]["sum_target"] == 5  # smoothing floor: +1 per token, no target hits
    assert got[0]["sum_target"] > got[0]["n_toks"]


def test_paragraph_dedup_separator_is_literal_not_regex(spark):
    from otel_kafka_pg_spark.operators.dedup import paragraph_dedup

    # "||" as a regex is an empty alternation (splits between every char);
    # as a literal separator doc 0 is [a, b, a] and doc 1's "b" is a repeat
    rows = [(0, "a||b||a"), (1, "b")]
    got = {r["doc_id"]: r.asDict() for r in
           paragraph_dedup(spark.createDataFrame(rows, "doc_id long, text string"),
                           sep="||").collect()}
    assert got[0]["clean_text"] == "a||b" and got[0]["n_removed"] == 1
    assert got[1]["clean_text"] == "" and got[1]["n_removed"] == 1


def test_span_dup_fraction_planted_spans(spark):
    """ExactSubstr semantics: a span shared ACROSS docs flags both sides;
    a span repeated WITHIN one doc flags every occurrence; fresh spans
    don't. gram_n=3, so a doc is (len-2) gram positions."""
    from otel_kafka_pg_spark.operators.dedup import span_dup_fraction

    rows = [
        (1, "x y z q r"),   # shares "x y z" with doc 3 -> 1 of 3 dup
        (2, "a a a a"),     # "a a a" twice internally -> 2 of 2 dup
        (3, "x y z w v"),   # shares "x y z" with doc 1 -> 1 of 3 dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dup_fraction(df, gram_n=3).collect()}
    assert (got[1]["n_grams"], got[1]["n_dup"]) == (3, 1)
    assert (got[2]["n_grams"], got[2]["n_dup"]) == (2, 2)
    assert (got[3]["n_grams"], got[3]["n_dup"]) == (3, 1)
    assert got[2]["dup_frac"] == 1.0 and got[1]["dup_frac"] == round(1 / 3, 6)
    # shuffle payloads are hashes: no gram STRING survives past the explode
    plan = span_dup_fraction(df, gram_n=3)._jdf.queryExecution().executedPlan().toString()
    import re
    assert not re.search(r"Exchange hashpartitioning\(gram", plan)


def test_span_dup_fast_twin_matches_md5_path(spark, sf_dir):
    """dd7x (xxhash64 production keys) must reproduce dd7's md5-path
    frame exactly — both hashes are collision-free on these gram sets, so
    only the key REPRESENTATION differs, never the counts."""
    from otel_kafka_pg_spark.operators.dedup import span_dup_fraction

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = span_dup_fraction(d, gram_n=3)
    b = span_dup_fraction(d, gram_n=3, hash_impl="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quantize_embeddings_roundtrip_and_range(spark):
    from otel_kafka_pg_spark.operators.simsearch import quantize_embeddings

    df, m = _emb(spark, n=50, d=8)
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert len(rows) == 50
    for vid, vec in enumerate(m):
        q, scale = rows[vid]["q"], rows[vid]["scale"]
        assert max(abs(c) for c in q) <= 127
        # the max-|v| element quantizes to exactly ±127
        assert 127 in {abs(c) for c in q} or max(abs(x) for x in vec) == 0
        for c, v in zip(q, vec):
            assert abs(c * scale - v) <= scale / 2 + 1e-9


def test_quantize_embeddings_zero_vector_and_nulls(spark):
    from otel_kafka_pg_spark.operators.simsearch import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [1.0, -2.0])],
        "vec_id int, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert set(rows) == {0, 2}  # NULL vector dropped at entry
    assert rows[0]["q"] == [0, 0] and rows[0]["scale"] == 0.0
    assert rows[2]["q"] == [64, -127]  # floor(63.5+0.5), floor(-127+0.5)=-127


def test_zero_norm_vectors_never_top_similarity(spark):
    """A zero-norm embedding divides 0/0 = NaN, and Spark's NaN-is-largest
    order would put it FIRST in every descending top-k and through every
    cosine >= threshold filter. Both the JVM and Arrow cosine paths and
    both pair generators must exclude it at entry; a zero QUERY vector
    raises (cosine undefined). quantize_embeddings, which can represent a
    zero vector exactly, must still keep it."""
    from otel_kafka_pg_spark.operators.simsearch import (
        cosine_topk,
        cosine_topk_pandas,
        quantize_embeddings,
    )
    from otel_kafka_pg_spark.operators.dedup import embedding_lsh_pairs

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None)],
        "vec_id int, embedding array<float>",
    )
    for fn in (cosine_topk, cosine_topk_pandas):
        got = fn(df, [1.0, 0.0], k=4).collect()
        ids = [r["vec_id"] for r in got]
        assert 0 not in ids and 3 not in ids, fn.__name__
        assert ids[0] == 1 and got[0]["cosine"] == 1.0, fn.__name__
        with pytest.raises(ValueError, match="zero norm"):
            fn(df, [0.0, 0.0], k=4)
    pair_ids = {
        i
        for r in embedding_cosine_pairs(df, threshold=0.0).collect()
        for i in (r["id_a"], r["id_b"])
    }
    assert pair_ids == {1, 2}
    lsh_ids = {
        i
        for r in embedding_lsh_pairs(df, threshold=0.0, bits=2).collect()
        for i in (r["id_a"], r["id_b"])
    }
    assert 0 not in lsh_ids and 3 not in lsh_ids
    q = {r["vec_id"] for r in quantize_embeddings(df).collect()}
    assert q == {0, 1, 2}  # zero vector representable; only NULL dropped


def test_minhash_lsh_pairs_rejects_bad_band_config(spark):
    """bands > num_hashes would make every band hash a constant (one
    bucket, O(n^2) cross join); an indivisible combo silently drops
    trailing signatures. Both must raise."""
    from otel_kafka_pg_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, num_hashes=32, bands=48)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, num_hashes=32, bands=5)
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, num_hashes=32, bands=0)


def test_ngram_jaccard_pairs_unbounded_raises_on_large_input(spark):
    """Same guard as embedding_cosine_pairs: all-pairs O(n^2) without a
    bound must refuse large inputs, with the same escape hatches."""
    from otel_kafka_pg_spark.operators.dedup import (
        _UNBOUNDED_PAIRS_CAP,
        ngram_jaccard_pairs,
    )

    big = spark.range(_UNBOUNDED_PAIRS_CAP + 1).selectExpr(
        "id AS doc_id", "'w1 w2 w3 w4' AS text"
    )
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(big)
    assert ngram_jaccard_pairs(big, max_id=3).count() == 3
    assert ngram_jaccard_pairs(big.limit(4), allow_unbounded=True).count() == 6
