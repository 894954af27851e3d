"""Source-format agnosticism: the pipeline is anchored on the TRANSCRIPTS
schema, not on parquet. The reference ingests protobuf records from Kafka
(consumer.go → processor decode batches); this engine's equivalent claim
is that any source format Spark can coerce to the contract schema feeds
the SAME plan and yields BYTE-IDENTICAL routed output — including the
content-derived deterministic row IDs (the fixed processor.go:348-367
scheme), which hash every routed column and therefore catch a single
format-coercion drift anywhere in the row.

JSON and CSV are the adversarial formats here: both serialize timestamps
as strings, so the read path exercises Spark's timestamp parsing
(TimestampType under the engine's pinned UTC session), CSV additionally
exercises null round-tripping (the nullable ``tool`` column) and loses
all type information without the explicit schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otel_kafka_pg_spark.plans.pipeline import build_routed
from otel_kafka_pg_spark.schemas import TRANSCRIPTS


def _routed_fingerprint(df):
    """Order-insensitive full-frame fingerprint: per-row sha2 over every
    column (null-tagged), xor-free — aggregated as count + sum of the
    first 15 hex digits so two frames agree iff their multisets agree."""
    cols = sorted(df.columns)
    row_sha = F.sha2(
        F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        ),
        256,
    )
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring(row_sha, 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]


@pytest.fixture(scope="module")
def parquet_routed(spark, transcripts_path):
    base = spark.read.parquet(transcripts_path)
    return _routed_fingerprint(build_routed(spark, base))


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_routed_output_identical_across_source_formats(
    spark, transcripts_path, tmp_path_factory, parquet_routed, fmt
):
    base = spark.read.parquet(transcripts_path)
    out = str(tmp_path_factory.mktemp(f"src_{fmt}"))
    if fmt == "json":
        base.write.mode("overwrite").json(out)
        again = spark.read.schema(TRANSCRIPTS).json(out)
    else:
        # ISO-8601 with microseconds: CSV has no native timestamp type, so
        # the write must not truncate sub-second precision the pipeline's
        # ordering window and content IDs depend on
        base.write.mode("overwrite").option("header", True).option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        ).csv(out)
        again = (
            spark.read.schema(TRANSCRIPTS)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            .csv(out)
        )
    # the round-tripped source must already be row-identical pre-pipeline …
    assert _routed_fingerprint(again.select(*base.columns)) == _routed_fingerprint(base)
    # … and feed the full parse → enrich → route DAG to the same frame,
    # deterministic row IDs included
    assert _routed_fingerprint(build_routed(spark, again)) == parquet_routed


def test_csv_null_tool_round_trips(spark, transcripts_path, tmp_path_factory):
    """CSV's empty-string-vs-null ambiguity must not invent tool values:
    the synth corpus contains null tools (signup turns), and route/enrich
    key on tool — a null→'' drift would silently re-route those turns."""
    base = spark.read.parquet(transcripts_path)
    n_null = base.filter(F.col("tool").isNull()).count()
    assert n_null > 0, "fixture lost its null-tool turns — test is vacuous"
    out = str(tmp_path_factory.mktemp("src_csv_null"))
    base.write.mode("overwrite").option("header", True).csv(out)
    again = spark.read.schema(TRANSCRIPTS).option("header", True).csv(out)
    assert again.filter(F.col("tool").isNull()).count() == n_null
