"""Negative controls for the driver quality gates (gx1–gx3): a gate that
never trips is a trust-me test with extra steps. Each control plants a
broken production twin and asserts the gate FAILS; the positive cases
(real twins pass) are covered by the oracle differential at sf0.01 and the
sf0.1 rehearsal (BENCH/rehearsal_r5_sf01*.json)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_kafka_pg_spark.operators.dedup import (
    simhash_near_pairs,
    span_dup_fraction,
    twin_recall_gate,
)
from otel_kafka_pg_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def md5_pairs(docs):
    return simhash_near_pairs(docs, max_hamming=8, variant="md5")


def test_twin_recall_gate_passes_on_real_twins(docs, md5_pairs):
    xxp = simhash_near_pairs(docs, max_hamming=8)
    row = twin_recall_gate(md5_pairs, xxp).collect()[0]
    assert row["a_pairs"] > 0 and row["a_strong"] > 0
    assert row["b_recall_ok"] == 1 and row["a_recall_ok"] == 1


def test_twin_recall_gate_trips_on_misaligned_ids(md5_pairs):
    # a twin whose join keys drifted (id remapping bug, wrong id column):
    # it "finds" pairs, but none line up with the oracled family's
    broken = md5_pairs.withColumn("id_a", F.col("id_a") + F.lit(10_000_000))
    row = twin_recall_gate(md5_pairs, broken).collect()[0]
    assert row["b_recall_ok"] == 0  # broken twin re-detects none of a's strong pairs
    assert row["a_recall_ok"] == 0  # and a finds none of the broken twin's


def test_twin_recall_gate_trips_on_empty_twin(md5_pairs):
    # a twin that silently finds nothing (over-aggressive block guard,
    # wrong threshold constant): strong pairs exist on the a-side, so a
    # 0-pair b-side must fail b_recall_ok; a_recall_ok is vacuously true
    # (no b-strong pairs to re-detect) — the asymmetry is the point: the
    # gate emits BOTH directions so one of them always has teeth
    empty = md5_pairs.filter(F.lit(False))
    row = twin_recall_gate(md5_pairs, empty).collect()[0]
    assert row["b_recall_ok"] == 0
    assert row["a_recall_ok"] == 1


def test_twin_recall_gate_tolerates_bounded_divergence(md5_pairs):
    # legitimate family divergence (the sf0.1 measurement: ~5% of strong
    # pairs missed cross-family) must PASS at min_recall_pct=90: drop one
    # strong pair from the twin — 1 miss of 6 strong at sf0.01 is 83%,
    # so use min_recall_pct low enough to isolate the arithmetic
    one_strong = (
        md5_pairs.filter(F.col("hamming") <= 1).orderBy("id_a", "id_b").limit(1)
    )
    thinned = md5_pairs.join(one_strong, ["id_a", "id_b"], "left_anti")
    row = twin_recall_gate(md5_pairs, thinned, min_recall_pct=50).collect()[0]
    assert row["b_recall_ok"] == 1
    strict = twin_recall_gate(md5_pairs, thinned, min_recall_pct=100).collect()[0]
    assert strict["b_recall_ok"] == 0  # zero-miss contract trips on 1 miss


def test_spanfrac_twin_gate_arithmetic_trips_on_perturbed_counts(docs):
    # gx2's contract is full-frame equality of (n_grams, n_dup) between the
    # md5 and xxhash64 gram-key paths; perturb one column of the twin and
    # the differing-row count must go positive for every doc touched
    a = span_dup_fraction(docs, gram_n=3)
    b = span_dup_fraction(docs, gram_n=3, hash_impl="xxhash64")
    broken = b.withColumn("n_dup", F.col("n_dup") + 1)
    j = a.alias("a").join(broken.alias("b"), "doc_id", "full")
    diff = j.filter(
        F.expr("a.n_grams IS DISTINCT FROM b.n_grams OR a.n_dup IS DISTINCT FROM b.n_dup")
    ).count()
    assert diff == a.count()
    # and the real twins agree row-for-row (the gx2 positive case)
    j2 = a.alias("a").join(b.alias("b"), "doc_id", "full")
    assert (
        j2.filter(
            F.expr("a.n_grams IS DISTINCT FROM b.n_grams OR a.n_dup IS DISTINCT FROM b.n_dup")
        ).count()
        == 0
    )
