"""Pipeline parity gates (the BASELINE.json correctness contract):

1. routed-row-set equality vs the independent pandas reference
   (exceptAll both directions == 0, per sink);
2. per-sink aggregate-count parity;
3. determinism: two runs → identical content hashes;
4. idempotent resume: fail after the first sink, resume, final state
   identical to an uninterrupted run.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from otel_kafka_pg_spark.plans.pipeline import SinkFailure, run_pipeline
from otel_kafka_pg_spark.schemas import LOGS_SINK, METRICS_SINK, SINK_COUNTS, TRACES_SINK
from otel_kafka_pg_spark.sources.synth import service_lookup_pandas

from reference_impl import route_reference

SINK_SCHEMAS = {"traces": TRACES_SINK, "logs": LOGS_SINK, "metrics": METRICS_SINK, "sink_counts": SINK_COUNTS}


@pytest.fixture(scope="module")
def pipe_out(spark, transcripts_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipe"))
    manifest = run_pipeline(spark, transcripts_path, out)
    return out, manifest


@pytest.fixture(scope="module")
def expected(transcripts_path):
    transcripts = pd.read_parquet(transcripts_path)
    return route_reference(transcripts, service_lookup_pandas())


@pytest.mark.parametrize("sink", ["traces", "logs", "metrics", "sink_counts"])
def test_routed_row_set_equality(spark, pipe_out, expected, sink):
    out, _ = pipe_out
    got = spark.read.parquet(f"{out}/{sink}")
    exp_pdf = expected[sink].copy()
    if sink == "sink_counts":
        exp_pdf["time_bucket"] = exp_pdf["time_bucket"].astype("datetime64[us]")
    exp = spark.createDataFrame(exp_pdf, SINK_SCHEMAS[sink])
    assert got.count() == len(exp_pdf)
    assert got.exceptAll(exp).count() == 0, f"{sink}: rows the engine produced but oracle didn't"
    assert exp.exceptAll(got).count() == 0, f"{sink}: rows the oracle produced but engine didn't"


def test_per_sink_aggregate_count_parity(spark, pipe_out, expected):
    out, manifest = pipe_out
    for sink in ("traces", "logs", "metrics"):
        assert manifest["sinks"][sink]["rows"] == len(expected[sink])
    n_total = sum(len(expected[s]) for s in ("traces", "logs", "metrics"))
    assert manifest["sinks"]["traces"]["input_rows"] == n_total


def test_lineage_covers_all_rows(pipe_out):
    _, manifest = pipe_out
    for sink, entry in manifest["sinks"].items():
        assert sum(p["rows"] for p in entry["lineage"]) == entry["rows"], sink


def test_determinism_rerun_same_hashes(spark, transcripts_path, pipe_out, tmp_path):
    _, manifest1 = pipe_out
    out2 = str(tmp_path / "rerun")
    manifest2 = run_pipeline(spark, transcripts_path, out2, parse_impl="native")
    for sink in ("traces", "logs", "metrics", "sink_counts"):
        assert manifest1["sinks"][sink]["content_hash"] == manifest2["sinks"][sink]["content_hash"], sink
        assert manifest1["sinks"][sink]["rows"] == manifest2["sinks"][sink]["rows"], sink


def test_idempotent_resume_after_partial_failure(spark, transcripts_path, pipe_out, tmp_path):
    _, manifest_full = pipe_out
    out = str(tmp_path / "resume")
    with pytest.raises(SinkFailure):
        run_pipeline(spark, transcripts_path, out, fail_after_sink="traces")
    # traces completed before the crash; logs/metrics/counts did not
    from otel_kafka_pg_spark.plans.manifest import load_manifest

    partial = load_manifest(out)
    assert partial["sinks"]["traces"]["status"] == "complete"
    assert "logs" not in partial["sinks"]

    resumed = run_pipeline(spark, transcripts_path, out)  # resume from manifest
    for sink in ("traces", "logs", "metrics", "sink_counts"):
        assert resumed["sinks"][sink]["content_hash"] == manifest_full["sinks"][sink]["content_hash"], sink


def test_resume_skips_completed_sinks(spark, transcripts_path, pipe_out):
    out, manifest = pipe_out
    again = run_pipeline(spark, transcripts_path, out)  # everything complete → no-op
    assert {s: e["content_hash"] for s, e in again["sinks"].items()} == {
        s: e["content_hash"] for s, e in manifest["sinks"].items()
    }


def test_no_persist_mode_identical_hashes(spark, transcripts_path, pipe_out, tmp_path):
    # the 100 TB configuration (SCALE.md): no fan-out cache, sinks recompute
    _, manifest1 = pipe_out
    out = str(tmp_path / "nopersist")
    manifest2 = run_pipeline(spark, transcripts_path, out, persist_routed=False)
    for sink in ("traces", "logs", "metrics", "sink_counts"):
        assert manifest1["sinks"][sink]["content_hash"] == manifest2["sinks"][sink]["content_hash"], sink


def test_onepass_partitioned_routing_matches_multiwrite(spark, transcripts_path, pipe_out, tmp_path):
    """SCALE.md's one-pass layout: a single partitionBy(signal_type) write
    + per-sink pruned views must yield exactly the multi-write pipeline's
    per-sink rows and content hashes, and reading one sink must prune to
    its partition (not scan the other signal types)."""
    import os

    from otel_kafka_pg_spark.operators.route import SINK_BUILDERS
    from otel_kafka_pg_spark.plans.pipeline import run_pipeline_onepass

    out = str(tmp_path / "onepass")
    manifest = run_pipeline_onepass(spark, transcripts_path, out)
    _, multi = pipe_out  # the standard three-write run over the same input

    for sink in ("traces", "logs", "metrics", "sink_counts"):
        assert manifest["sinks"][sink]["rows"] == multi["sinks"][sink]["rows"], sink
        assert manifest["sinks"][sink]["content_hash"] == multi["sinks"][sink]["content_hash"], sink

    # partition pruning: the traces view's scan must carry a NON-EMPTY
    # PartitionFilters on signal_type ('PartitionFilters: []' prints on
    # every parquet scan, so presence of the label alone proves nothing)
    import re

    back = spark.read.parquet(os.path.join(out, "routed"))
    plan = SINK_BUILDERS["traces"](back)._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "signal_type" in m.group(1) and "trace" in m.group(1), m.group(0) if m else plan[:500]


def test_multiwrite_resume_over_onepass_layout_rewrites(spark, transcripts_path, tmp_path):
    """Layout-mismatch resume symmetry (round-3 advice): a onepass manifest
    marks the same sink names complete but never wrote the per-sink
    directories — resuming run_pipeline over it must rewrite everything
    (and vice versa, which run_pipeline_onepass already guards)."""
    import os

    from otel_kafka_pg_spark.plans.pipeline import run_pipeline_onepass

    out = str(tmp_path / "mixed")
    run_pipeline_onepass(spark, transcripts_path, out)
    manifest = run_pipeline(spark, transcripts_path, out)  # must NOT no-op
    for sink in ("traces", "logs", "metrics", "sink_counts"):
        dest = os.path.join(out, sink)
        assert os.path.isdir(dest), f"{sink}: multiwrite resume over onepass wrote nothing"
        assert manifest["sinks"][sink]["rows"] == spark.read.parquet(dest).count()
    assert manifest.get("layout") != "onepass"


def test_pipeline_survives_mega_conversation_skew(spark, tmp_path):
    """Stress the documented skew bound: the synth contract caps
    conversations at ~4k turns, but a real corpus can violate it. One
    conversation holding 50% of all turns (25k of 50k) must still route
    correctly — the ordering window sorts it in ONE task (that is the
    design: a conversation is the unit of ordering), so this pins that a
    cap violation degrades to a slow task, not an error or wrong rows."""
    import pandas as pd

    from otel_kafka_pg_spark.plans.pipeline import run_pipeline

    n_mega, n_rest = 25_000, 25_000
    rows = {
        "conv_id": ["conv-mega"] * n_mega + [f"conv-{i % 500:05d}" for i in range(n_rest)],
        "turn_idx": list(range(n_mega)) + [i // 500 for i in range(n_rest)],
        "role": ["user"] * (n_mega + n_rest),
        "text": [f"turn {i} INFO" for i in range(n_mega + n_rest)],
        "tool": ["search"] * (n_mega + n_rest),
        # datetime64[us]: Spark's parquet reader rejects TIMESTAMP(NANOS)
        "ts": pd.to_datetime(
            1735689600_000 + pd.Series(range(n_mega + n_rest)) * 1000, unit="ms"
        ).astype("datetime64[us]"),
    }
    src = str(tmp_path / "skew_src")
    pd.DataFrame(rows).to_parquet(src + ".parquet")
    out = str(tmp_path / "skew_out")
    manifest = run_pipeline(spark, src + ".parquet", out, resume=False)
    total = sum(manifest["sinks"][s]["rows"] for s in ("traces", "logs", "metrics"))
    assert total == n_mega + n_rest  # every turn routed exactly once
    import pyspark.sql.functions as _F

    logs = spark.read.parquet(f"{out}/logs")
    mega = logs.filter(_F.col("conv_id") == "conv-mega")
    assert mega.count() == n_mega
    # ordering survived the skew: turn_idx is dense 0..n-1 for the mega conv
    mm = mega.agg(_F.min("turn_idx"), _F.max("turn_idx"), _F.count_distinct("turn_idx")).collect()[0]
    assert tuple(mm) == (0, n_mega - 1, n_mega)


def test_resume_invalidated_by_different_lookup(spark, transcripts_path, tmp_path):
    """A partial/complete resume must not mix enrichments: the same out_dir
    re-run with a DIFFERENT lookup re-derives every sink (the fingerprint
    folds the lookup content in), and with the SAME lookup resumes as a
    no-op."""
    import pandas as pd

    lk1 = spark.createDataFrame(service_lookup_pandas())
    out = str(tmp_path / "lk_out")
    m1 = run_pipeline(spark, transcripts_path, out, lookup=lk1)
    assert m1.get("turns_per_sec") is not None
    # same lookup content (fresh frame) → clean resume, nothing rewritten
    lk1b = spark.createDataFrame(service_lookup_pandas())
    m2 = run_pipeline(spark, transcripts_path, out, lookup=lk1b)
    assert m2["sinks"] == m1["sinks"] and "elapsed_sec" not in (m2.keys() - m1.keys())
    # different lookup → full rewrite with the new enrichment
    alt = service_lookup_pandas()
    alt["service_name"] = alt["service_name"] + "-v2"
    m3 = run_pipeline(spark, transcripts_path, out, lookup=spark.createDataFrame(alt))
    assert m3["input_fingerprint"] != m1["input_fingerprint"]
    assert (
        spark.read.parquet(f"{out}/traces").filter("service_name LIKE '%-v2'").count() > 0
    )


def test_input_fingerprint_recursive_and_distinct(tmp_path):
    """Partitioned (nested) inputs fingerprint their nested files; distinct
    empty/missing inputs never share a fingerprint (the ''=='' false-match
    that made resume skip work over a different dataset)."""
    from otel_kafka_pg_spark.plans.manifest import input_fingerprint

    a = tmp_path / "in_a" / "signal_type=log"
    a.mkdir(parents=True)
    (a / "part-0.parquet").write_bytes(b"x" * 10)
    fp1 = input_fingerprint(str(tmp_path / "in_a"))
    assert "part-0.parquet:10" in fp1 and "signal_type=log" in fp1
    (a / "part-0.parquet").write_bytes(b"x" * 11)  # same name, new size
    assert input_fingerprint(str(tmp_path / "in_a")) != fp1
    e1 = tmp_path / "empty_one"
    e2 = tmp_path / "empty_two"
    e1.mkdir()
    e2.mkdir()
    assert input_fingerprint(str(e1)) != input_fingerprint(str(e2))
    assert input_fingerprint(str(tmp_path / "missing_a")) != input_fingerprint(
        str(tmp_path / "missing_b")
    )


def test_input_fingerprint_normalizes_path_spelling(tmp_path, monkeypatch):
    """Equivalent spellings of the same input (relative vs absolute,
    trailing slash) must produce the SAME fingerprint — a job first run
    with ``--input data/in`` and resumed with ``--input /abs/data/in``
    must resume, not rewrite everything."""
    from otel_kafka_pg_spark.plans.manifest import input_fingerprint

    d = tmp_path / "in_norm"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 7)
    absolute = input_fingerprint(str(d))
    assert input_fingerprint(str(d) + "/") == absolute
    monkeypatch.chdir(tmp_path)
    assert input_fingerprint("in_norm") == absolute


def test_onepass_written_superset_is_slim(spark, transcripts_path, tmp_path):
    """The onepass routed write must carry only sink-consumed columns —
    never the raw text, the resource_attrs map, or turn_seq (the heaviest
    unconsumed columns; dropping them keeps the one write at the
    three-sink form's volume), and it records the same throughput fields
    as the multiwrite manifest."""
    from otel_kafka_pg_spark.plans.pipeline import run_pipeline_onepass

    out = str(tmp_path / "op_out")
    m = run_pipeline_onepass(spark, transcripts_path, out)
    written = spark.read.parquet(f"{out}/routed")
    assert not {"text", "resource_attrs", "turn_seq"} & set(written.columns)
    assert m.get("turns_per_sec") is not None
    assert all(e.get("input_rows") for e in m["sinks"].values())


def test_default_lookup_is_fingerprinted_for_resume(spark, transcripts_path, tmp_path):
    """Regression (r5 review): the DEFAULT enrich lookup must be folded into
    the resume fingerprint just like a caller-provided one — its content
    lives in code and can change between versions, the exact mixed-enrich
    resume _lookup_fingerprint guards against. Same content through either
    frame type (pandas default vs explicit Spark copy) → same fingerprint
    → clean resume; a different lookup → full rewrite."""
    from otel_kafka_pg_spark.plans.manifest import load_manifest
    from otel_kafka_pg_spark.schemas import SERVICE_LOOKUP
    from otel_kafka_pg_spark.sources.synth import service_lookup_pandas

    out = str(tmp_path / "deflk")
    manifest = run_pipeline(spark, transcripts_path, out)
    assert "|lookup:" in load_manifest(out)["input_fingerprint"]

    # explicit Spark copy of the default → fingerprint match → pure resume
    same = spark.createDataFrame(service_lookup_pandas())
    again = run_pipeline(spark, transcripts_path, out, lookup=same)
    assert again["input_fingerprint"] == manifest["input_fingerprint"]
    assert {s: e["content_hash"] for s, e in again["sinks"].items()} == {
        s: e["content_hash"] for s, e in manifest["sinks"].items()
    }

    # different lookup content → fingerprint mismatch → sinks re-run
    other = spark.createDataFrame(
        [("bash", "user", "svc-OTHER", "{}")], SERVICE_LOOKUP
    )
    redone = run_pipeline(spark, transcripts_path, out, lookup=other)
    assert redone["input_fingerprint"] != manifest["input_fingerprint"]
    assert (
        redone["sinks"]["traces"]["content_hash"]
        != manifest["sinks"]["traces"]["content_hash"]
    )
