"""Pins the session-14 oracle rewrite: the inverted-index pairwise-Jaccard
CTEs (``queries._jaccard_inv``) are row-for-row identical to the quadratic
``sh a JOIN sh b`` + ``list_intersect`` form they replaced.

The identity being relied on is |A∪B| = |A|+|B|−|A∩B| over DISTINCT
shingle lists, with both forms dividing the same integers (so the doubles
— and any ``round(., 4)`` of them — are bit-identical). This guard
re-proves it inside DuckDB on the real sf0.01 documents table for both
shingle-CTE variants the registry uses:

- the documents variant (``len(t) >= 3`` filter; cc1/cc2/dd3b), at the
  rounded 0.7 threshold;
- the short-doc-fallback variant (``CASE WHEN len(t) >= 3 ... ELSE
  [whole text]``; dp2/dp3/dp4), at the unrounded 0.6 threshold.

DuckDB-only — no Spark session — so it costs well under a second.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from otel_kafka_pg_spark.queries import _jaccard_inv

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")

_SH_DOCS = (
    "sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM ("
    "SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents) "
    "WHERE len(t) >= 3)"
)
_SH_FALLBACK = (
    "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN "
    "list_distinct(list_transform(generate_series(1, len(t) - 2), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) "
    "ELSE [array_to_string(t, ' ')] END AS s FROM "
    "(SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents))"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    path = os.path.join(SF_DIR, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize(
    "sh_cte,pred_quadratic,pred_inv",
    [
        (  # cc1/cc2/dd3b shape: rounded ratio at 0.7
            _SH_DOCS,
            "round(len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.7",
            "round(i / (ca.n + cb.n - i), 4) >= 0.7",
        ),
        (  # dp2/dp3/dp4 shape: unrounded ratio at 0.6, short-doc fallback
            _SH_FALLBACK,
            "len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))) >= 0.6",
            "i / (ca.n + cb.n - i) >= 0.6",
        ),
    ],
    ids=["docs-rounded-0.7", "fallback-unrounded-0.6"],
)
def test_inverted_index_equals_quadratic(duck, sh_cte, pred_quadratic, pred_inv):
    quadratic = (
        f"WITH {sh_cte} "
        "SELECT a.doc_id AS pa, b.doc_id AS pb FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        f"WHERE {pred_quadratic}"
    )
    inverted = (
        f"WITH {sh_cte}, {_jaccard_inv('sh')} "
        "SELECT pa, pb FROM inter "
        "JOIN cnt ca ON ca.doc_id = pa JOIN cnt cb ON cb.doc_id = pb "
        f"WHERE {pred_inv}"
    )
    old = sorted(duck.execute(quadratic).fetchall())
    new = sorted(duck.execute(inverted).fetchall())
    assert old == new
    assert len(new) > 0, "threshold admitted no pairs — the equivalence was vacuous"


def test_jaccard_values_identical_doubles(duck):
    """Not just the filtered pair SET: the jaccard doubles themselves must be
    bit-identical between the two forms (dd3b emits them as a value column)."""
    quadratic = (
        f"WITH {_SH_DOCS} "
        "SELECT a.doc_id AS pa, b.doc_id AS pb, "
        "len(list_intersect(a.s, b.s)) / len(list_distinct(list_concat(a.s, b.s))) AS j "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
        "WHERE len(list_intersect(a.s, b.s)) > 0"
    )
    inverted = (
        f"WITH {_SH_DOCS}, {_jaccard_inv('sh')} "
        "SELECT pa, pb, i / (ca.n + cb.n - i) AS j FROM inter "
        "JOIN cnt ca ON ca.doc_id = pa JOIN cnt cb ON cb.doc_id = pb"
    )
    old = sorted(duck.execute(quadratic).fetchall())
    new = sorted(duck.execute(inverted).fetchall())
    # exact ==, not approx: both divide the same two integers
    assert old == new
    assert len(new) > 100
