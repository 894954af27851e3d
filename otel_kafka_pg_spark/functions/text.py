"""Text-analysis column functions for training-data pipelines.

All of these are pure ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage codegen) — the hot path stays out of Python entirely. They
operate on a ``documents``-like table (doc_id, text, ...) at any scale:
every function is embarrassingly parallel per row, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword sets for the n-gram/lexicon language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def _stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    # NB: capture stopwords via this enclosing function, NOT a defaulted
    # lambda parameter — pyspark turns every lambda parameter into a lambda
    # variable, so `lambda t, s=sw:` silently becomes a two-variable lambda
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(stopwords)))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = LANG_STOPWORDS["en"] if stopwords is None else stopwords
    toks = tokens(col)
    return _stopword_hits(toks, sw) / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic ∈ [0,1]: length band + low punctuation +
    sane stopword density. Deterministic arithmetic only."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    length_ok = F.when((n >= 20) & (n <= 10000), 1.0).otherwise(0.3)
    punct_ok = 1.0 - F.least(punct_ratio(c) * 5, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.01) & (sw <= 0.6), 1.0).otherwise(0.5)
    return F.round((length_ok + punct_ok + sw_ok) / 3.0, 4)


def lang_id(col: Column | str) -> Column:
    """Lexicon-overlap language ID: argmax of stopword hits per language,
    'und' when nothing matches. Pure expression — a few array scans per row."""
    toks = tokens(col)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, sw in LANG_STOPWORDS.items():
        hits = _stopword_hits(toks, sw)
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def lang_id_cjk(col: Column | str, cjk_ratio: float = 0.3) -> Column:
    """lang_id extended with a CJK script fallback: stopword lexicons are
    useless for unsegmented Chinese (whitespace tokenization yields one
    giant token, zero lexicon hits → 'und'), so when no lexicon fires AND
    ≥ ``cjk_ratio`` of the non-space characters are in the CJK Unified
    Ideographs block, classify 'zh'. Same char-class semantics in Java
    regex ([\\u4E00-\\u9FFF]) and DuckDB's RE2 ([\\x{4E00}-\\x{9FFF}]),
    so the entry stays exactly oracled."""
    c = F.col(col) if isinstance(col, str) else col
    base = lang_id(col)
    n_cjk = F.length(c) - F.length(F.regexp_replace(c, "[一-鿿]", ""))
    n_nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    is_cjk = (n_nonspace > 0) & (n_cjk / n_nonspace >= cjk_ratio)
    return F.when((base == "und") & is_cjk, F.lit("zh")).otherwise(base)


# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs — the
# coarse split BPE vocabularies are trained over (GPT-2-style class split,
# identical semantics in Spark's and DuckDB's regex engines)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


# ---------------------------------------------------------------------------
# Gopher-style repetition / quality signals (Rae et al. 2021, "Scaling
# Language Models: Methods, Analysis & Insights from Training Gopher",
# Table A1) — the standard repetition filters of LLM training-data prep.
# All pure JVM expressions, embarrassingly parallel per row, zero shuffle;
# the one signal that needs an aggregation (top n-gram char fraction) lives
# in queries.t8 as a (doc_id, gram)-keyed groupBy.
# Reference-parity note: the reference repo (otel-kafka-pg) has no corpus
# layer at all; these extend the engine's training-data surface the same
# way dedup/ANN do.
# ---------------------------------------------------------------------------


def doc_lines(col: Column | str) -> Column:
    """Newline split — the line unit of the Gopher repetition signals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "\n")


def duplicate_line_fraction(col: Column | str) -> Column:
    """(n_lines - n_distinct_lines) / n_lines — the fraction of line slots
    occupied by repeats of an earlier line. Two array scans per row."""
    lines = doc_lines(col)
    n = F.size(lines)
    return (n - F.size(F.array_distinct(lines))) / F.greatest(n, F.lit(1))


def duplicate_line_char_fraction(col: Column | str) -> Column:
    """Characters in repeated line occurrences (beyond each line's first)
    over total line characters. O(distinct_lines × lines) per document —
    quadratic ONLY within one row's line list (documents have bounded line
    counts; no cross-row work, no shuffle)."""
    lines = doc_lines(col)
    dup_chars = F.aggregate(
        F.transform(
            F.array_distinct(lines),
            lambda d: (F.size(F.filter(lines, lambda x: x == d)) - 1) * F.length(d),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    total = F.aggregate(
        F.transform(lines, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    return dup_chars / F.greatest(total, F.lit(1))


def symbol_word_ratio(col: Column | str) -> Column:
    """(count('#') + count('...')) / n_words — Gopher's symbol-to-word
    ratio. '...' occurrences are leftmost non-overlapping in BOTH Java
    regex and DuckDB RE2, so the signal is exactly cross-engine."""
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    ellipses = F.regexp_count(c, F.lit(r"\.\.\."))
    return (hashes + ellipses) / F.greatest(token_count(c), F.lit(1))


def bullet_line_fraction(col: Column | str) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    lines = doc_lines(col)
    hits = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    return hits / F.greatest(F.size(lines), F.lit(1))


def ellipsis_line_fraction(col: Column | str) -> Column:
    """Fraction of lines ending in '...' (ignoring trailing whitespace)."""
    lines = doc_lines(col)
    hits = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$")))
    return hits / F.greatest(F.size(lines), F.lit(1))


def alpha_word_fraction(col: Column | str) -> Column:
    """Fraction of whitespace words containing ≥1 ASCII letter."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(col: Column | str) -> Column:
    """Mean whitespace-word length in characters."""
    toks = tokens(col)
    total = F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def word_2grams_all(col: Column | str) -> Column:
    """ALL word 2-gram occurrences (NOT distinct — unlike word_shingles,
    frequency matters here: the top-n-gram signal needs the mode). Linear
    per document via the _gram_structs slice-zip shape; empty array for
    docs with < 2 words (no 2-gram exists — t8 coalesces to 0.0)."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(_gram_structs(toks, 2, n), lambda s: F.concat_ws(" ", s["0"], s["1"]))
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def ws_tokens(col: Column | str) -> Column:
    """Lowercase whitespace tokens, empty-string-filtered — THE shared
    tokenizer: the vocab/shingle/TF-IDF operators (corpus._tokens) and the
    SimHash fingerprints (dedup._simhash_with) must tokenize through this
    one definition, or an adjustment to it (e.g. control-char stripping)
    would silently de-twin SimHash from the token-derived operators and
    break the cross-family comparability the twin gates rely on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != "")


def normalize_ws(col: Column | str) -> Column:
    """THE whitespace-normalization of this codebase: lowercase, trim,
    collapse whitespace runs to one space. Every content-fingerprint path
    (``fingerprint``, ``_winnowing``, ``incremental_dedup``) normalizes
    through this one definition — like ``md5_60bit``, a second copy
    drifting (e.g. one gaining control-char stripping) would silently
    de-twin the dedup indexes built on different waves."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def md5_60bit(c: Column) -> Column:
    """First 15 hex chars of md5 as a 60-bit long — THE engine-portable
    hash of this codebase (DuckDB twin: ``('0x' || substr(md5(x), 1,
    15))::BIGINT``). Every exactly-oracled consumer (winnowing t6, DSIR
    ds1) must hash through this one definition so cross-engine bit-parity
    can't drift between copies."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _winnowing(col: Column | str, k: int, window: int, gram_hash) -> Column:
    """ONE winnowing pipeline (normalize → char k-grams → per-gram hash →
    sliding-window minima → sorted distinct) parameterized by the gram
    hash, so the production and oracle variants below are structurally
    identical BY CONSTRUCTION — an edit to the shared shape cannot de-twin
    them and silently invalidate t6-vs-t6x comparability.

    Both sliding passes (char k-grams, window minima) use the zip-of-
    shifted-slices shape from _gram_structs — the naive substr/slice-
    inside-lambda form re-ran the normalization regex and the whole hash
    array per ELEMENT (O(n²) per document; see _gram_structs)."""
    norm = normalize_ws(col)
    chars = F.split(norm, "")  # one split per row; char array for k-gram zip
    n = F.size(chars)
    grams = F.transform(
        _gram_structs(chars, k, n),
        lambda s: gram_hash(F.concat_ws("", *[s[str(i)] for i in range(k)])),
    )
    m = F.size(grams)
    mins = F.transform(
        _gram_structs(grams, window, m), lambda s: F.least(*[s[str(i)] for i in range(window)])
    )
    return F.array_sort(F.array_distinct(mins))


def winnowing_fingerprints_md5(col: Column | str, k: int = 5, window: int = 4) -> Column:
    """Winnowing twin whose k-gram hash is the first 15 hex chars of
    md5(gram) as a 60-bit long — bit-for-bit reproducible OUTSIDE Spark
    (DuckDB: ('0x' || substr(md5(substr(norm,i,k)),1,15))::BIGINT), giving
    the whole winnowing pipeline an exact cross-engine oracle. The
    xxhash64 variant (winnowing_fingerprints) is the production path."""
    return _winnowing(col, k, window, md5_60bit)


def winnowing_fingerprints(col: Column | str, k: int = 5, window: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash all
    character k-grams (the rolling-hash analog — xxhash64 per position),
    then keep the minimum hash of every sliding window of ``window``
    positions. Guarantee: any shared substring of length ≥ k+window-1
    contributes at least one shared fingerprint — the basis of local
    (partial-overlap) duplicate detection, where full-document sha256 only
    catches exact duplicates. Pure JVM expressions; output is the sorted
    distinct fingerprint array."""
    return _winnowing(col, k, window, F.xxhash64)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: sha256 over whitespace-normalized lowercase text
    (the deterministic analog of a rolling content hash)."""
    return F.sha2(normalize_ws(col), 256)


def _gram_structs(arr: Column, k: int, n: Column) -> Column:
    """array of k-field structs, element i = (arr[i], …, arr[i+k-1]) —
    sliding k-grams via arrays_zip over k shifted slices.

    THE load-bearing shape: any expression referenced INSIDE a
    higher-order-function lambda is re-evaluated PER ELEMENT (Catalyst
    does not CSE across the lambda boundary), so the obvious
    ``transform(indices, i -> f(element_at(arr, i), …))`` re-computes
    ``arr`` — here a regex split of the whole document — once per gram:
    O(n²) per document, measured 10s for 5,000 docs at sf0.1. Slices and
    zip are ordinary per-ROW expressions (arr evaluates k times per row,
    not per element); the lambda then touches only its own struct fields.
    Result: the same grams at O(n) — 20× faster on the dd3 path."""
    width = F.greatest(n - (k - 1), F.lit(1))
    return F.arrays_zip(*[F.slice(arr, i + 1, width) for i in range(k)])


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array<string> — the exact-Jaccard
    input (dd2 and the brute-force oracles need the strings). JVM-side, no
    UDF; linear per document (see _gram_structs)."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(
        _gram_structs(toks, k, n), lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])
    )
    # short docs (< k tokens): fall back to the whole text as one shingle
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array(F.array_join(toks, " ")))


def hashed_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array<long> of xxhash64 values —
    the MinHash hot-path input: no per-gram string allocation (each gram
    hashes its k token fields directly), linear per document
    (_gram_structs). Set semantics are identical to word_shingles w.h.p.
    (a cardinality change needs two distinct grams of one doc colliding in
    64 bits), so Jaccard over these hashes equals Jaccard over the string
    shingles — asserted against the string form in tests and by the dd3b
    brute-force oracle."""
    toks = tokens(col)
    n = F.size(toks)
    grams = F.transform(
        _gram_structs(toks, k, n), lambda s: F.xxhash64(*[s[str(i)] for i in range(k)])
    )
    # short docs (< k tokens): the whole text as one shingle, like word_shingles
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array(F.xxhash64(F.array_join(toks, " "))))


CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_text(col: Column | str) -> Column:
    """Corpus-ingest text normalization: strip C0/DEL control characters,
    collapse whitespace runs to one space, trim. Pure JVM regexp_replace —
    the pattern subset has identical java.util.regex / RE2 semantics (the
    px1 discipline), so an independent engine reproduces the bytes exactly.
    Zero shuffle, O(len) per row, whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, CONTROL_CHARS, "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))
