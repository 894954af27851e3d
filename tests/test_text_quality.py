"""Gopher repetition/quality signal tests (Rae et al. 2021, Table A1).

The sf testdata documents are single-line word soups, so the oracle
differential exercises the word-level signals but leaves every LINE-based
signal at 0.0 — these tests pin the line signals (duplicate lines, bullet
lines, ellipsis lines) and the top-2-gram mode on handcrafted documents
with known exact fractions, plus the t8 verdict end-to-end on a tiny
on-disk documents table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from otel_kafka_pg_spark.functions import text as tx
from otel_kafka_pg_spark.queries import all_queries


def _one(spark, doc: str, expr) -> float:
    row = spark.createDataFrame([(doc,)], "text string").select(expr.alias("v")).head()
    return row["v"]


def test_duplicate_line_fraction_exact(spark):
    # 4 lines, "same" appears 3× → 3 slots, 2 are repeats → (4-2)/4 = 0.5
    doc = "same\nsame\nother\nsame"
    assert _one(spark, doc, tx.duplicate_line_fraction("text")) == pytest.approx(0.5)
    assert _one(spark, "a\nb\nc", tx.duplicate_line_fraction("text")) == 0.0


def test_duplicate_line_char_fraction_exact(spark):
    # lines: "aaaa"×2 (4 chars each), "bb" once → repeated-occurrence chars
    # beyond first = 4; total line chars = 4+4+2 = 10 → 0.4
    doc = "aaaa\naaaa\nbb"
    assert _one(spark, doc, tx.duplicate_line_char_fraction("text")) == pytest.approx(0.4)


def test_bullet_and_ellipsis_line_fractions(spark):
    doc = "- item one\n* item two\nplain line\nto be continued...\n  • indented bullet"
    # 5 lines: 3 bullets, 1 ellipsis-terminated
    assert _one(spark, doc, tx.bullet_line_fraction("text")) == pytest.approx(0.6)
    assert _one(spark, doc, tx.ellipsis_line_fraction("text")) == pytest.approx(0.2)


def test_symbol_word_ratio_counts_hashes_and_ellipses(spark):
    # 4 words, two '#' chars + one non-overlapping '...' in 'wait....' (the
    # 4-dot run yields exactly one leftmost match) → 3/4
    doc = "## heading words wait...."
    assert _one(spark, doc, tx.symbol_word_ratio("text")) == pytest.approx(0.75)


def test_alpha_word_fraction_and_mean_word_length(spark):
    doc = "abc 123 a1 ##"  # 4 words, 3 contain a letter... a1 yes, 123 no, ## no → 2/4
    assert _one(spark, doc, tx.alpha_word_fraction("text")) == pytest.approx(0.5)
    # lengths 3+3+2+2 = 10 over 4 words
    assert _one(spark, doc, tx.mean_word_length("text")) == pytest.approx(2.5)


def test_word_2grams_all_keeps_duplicates_short_doc_empty(spark):
    grams = _one(spark, "x y x y", tx.word_2grams_all("text"))
    assert grams == ["x y", "y x", "x y"]  # NOT distinct — frequency matters
    assert _one(spark, "solo", tx.word_2grams_all("text")) == []


def test_t8_verdict_on_handcrafted_corpus(spark, tmp_path):
    """End-to-end t8 over an on-disk documents table: a clean doc passes,
    a top-2-gram-degenerate doc and a short doc fail for their own
    reasons."""
    # all-unique words: every 2-gram occurs once → top2_char_frac ≈ glen/n_chars ≈ 0.03
    clean = " ".join(f"tok{i}" for i in range(60))
    degenerate = "spam ham " * 60  # one 2-gram dominates → top2_char_frac ≈ 1
    short = "too few words here"
    rows = [(0, clean, "en", "synthetic", len(clean)),
            (1, degenerate.strip(), "en", "synthetic", len(degenerate.strip())),
            (2, short, "en", "synthetic", len(short))]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = os.path.join(str(tmp_path), "documents.parquet")
    df.write.parquet(out)
    fn = all_queries()["t8_gopher_quality_filter"]
    got = {r["doc_id"]: r.asDict() for r in fn(spark, str(tmp_path)).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["top2_char_frac"] > 0.2
    assert got[2]["keep"] is False and got[2]["n_words"] < 50


def test_t7_zero_shuffle_plan(spark, tmp_path):
    """t7 is pure per-row projection — its physical plan must contain NO
    exchange: scan → project, nothing else moves data."""
    df = spark.createDataFrame([(0, "a b c", "en", "s", 5)],
                               "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    fn = all_queries()["t7_repetition_signals"]
    plan = fn(spark, str(tmp_path))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_clean_text_exact_bytes(spark):
    from pyspark.sql import functions as F

    from otel_kafka_pg_spark.functions.text import clean_text

    rows = [
        (0, "hello\x00\x07world"),          # control chars deleted, no space added
        (1, "  a\t\tb\nc   d  "),            # whitespace runs -> single spaces, trimmed
        (2, "already clean"),
        (3, "\x1f\x7f"),                     # only control chars -> empty string
    ]
    out = dict(
        spark.createDataFrame(rows, "doc_id int, text string")
        .select("doc_id", clean_text("text").alias("c"))
        .collect()
    )
    assert out == {0: "helloworld", 1: "a b c d", 2: "already clean", 3: ""}
