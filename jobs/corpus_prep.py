#!/usr/bin/env python
"""spark-submit entry point for the corpus-assembly pipeline.

Runs the training-data prep chain (quality gate → exact dedup →
cluster-resolved near-dup dedup → per-language stratified sample →
per-shard sequence packing — per-stage functions shared with the
registry's driver-verified dp4 entry, see ``plans/corpus_prep.py``),
persisting each stage's keep-set as a doc_id list plus the packed bins,
with a manifest of per-stage row counts for lineage.

Re-running with the same --input/--output **resumes**: stages whose
output already exists for the same input fingerprint + parameters are
loaded from disk instead of recomputed, so a job killed after the
expensive near-dup stage restarts at the sample, not at zero — the same
checkpoint-manifest discipline as the transcript pipeline
(plans/pipeline.py). A changed input or parameter set invalidates
everything downstream (the whole chain: every stage depends on all
parameters upstream of it, and stage params are all-or-nothing here).

Cluster usage::

    zip -r engine.zip otel_kafka_pg_spark
    spark-submit --py-files engine.zip jobs/corpus_prep.py \
        --input  <documents parquet path> \
        --output <out root> \
        [--quality-min 0.5] [--near-threshold 0.6] [--per-stratum 25] \
        [--shard-size 128] [--token-budget 512] [--no-resume]

Local smoke::

    python jobs/corpus_prep.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/corpus_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ("gated", "kept", "reps", "sample", "packed")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path (doc_id, text, lang, …)")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--near-threshold", type=float, default=0.6)
    ap.add_argument("--per-stratum", type=int, default=25)
    ap.add_argument("--shard-size", type=int, default=128)
    ap.add_argument("--token-budget", type=int, default=512)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    elif SparkConf().contains("spark.master"):
        from otel_kafka_pg_spark.session import get_submit_spark

        spark = get_submit_spark(app_name="corpus_prep")
    else:
        from otel_kafka_pg_spark.session import get_spark

        spark = get_spark(app_name="corpus_prep")

    from otel_kafka_pg_spark.plans import corpus_prep as cp
    from otel_kafka_pg_spark.plans.manifest import input_fingerprint, parquet_file_lineage

    params = {
        "quality_min": args.quality_min,
        "near_threshold": args.near_threshold,
        "per_stratum": args.per_stratum,
        "shard_size": args.shard_size,
        "token_budget": args.token_budget,
    }
    fp = f"{input_fingerprint(args.input)}::{json.dumps(params, sort_keys=True)}"
    manifest_path = os.path.join(args.output, "manifest.json")
    prior = {}
    if not args.no_resume and os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            existing = json.load(fh)
        if existing.get("fingerprint") == fp:
            prior = existing.get("counts", {})

    docs = spark.read.parquet(args.input)
    counts: dict[str, int] = {"input": docs.count()}
    resumed: list[str] = []

    def load_or_build(name: str, build):
        """Reuse a stage output iff the manifest recorded it for THIS
        fingerprint and the directory committed (_SUCCESS) — a stage dir
        from a crashed write or a different run never short-circuits."""
        dest = os.path.join(args.output, name)
        if name in prior and os.path.exists(os.path.join(dest, "_SUCCESS")):
            resumed.append(name)
            counts[name] = prior[name]
            return spark.read.parquet(dest)
        frame = build()
        if name != "packed":
            frame = frame.select("doc_id")
        frame.write.mode("overwrite").parquet(dest)
        out = spark.read.parquet(dest)
        counts[name] = out.count()
        return out

    gated_ids = load_or_build("gated", lambda: cp.quality_gate(docs, args.quality_min))
    # stage handoffs are id lists; rejoin the source for stages that need text
    kept_ids = load_or_build(
        "kept", lambda: cp.exact_keep(docs.join(gated_ids.select("doc_id"), "doc_id"))
    )
    reps = load_or_build(
        "reps",
        lambda: cp.near_dup_reps(docs.join(kept_ids.select("doc_id"), "doc_id"), args.near_threshold),
    )
    sample = load_or_build("sample", lambda: cp.quota_sample(docs, reps, args.per_stratum))
    packed = load_or_build(
        "packed", lambda: cp.pack_bins(docs, sample, args.shard_size, args.token_budget)
    )

    counts["packed_bins"] = counts.pop("packed")
    total_tokens = packed.agg({"total_tokens": "sum"}).collect()[0][0]
    # per-partition lineage from parquet footers (no extra jobs) — the same
    # discipline as the transcript pipeline's sink manifests
    lineage = {name: parquet_file_lineage(os.path.join(args.output, name)) for name in STAGES}
    manifest = {
        "input": args.input,
        "fingerprint": fp,
        "params": params,
        "counts": {**counts, "packed": counts["packed_bins"]},
        "resumed_stages": resumed,
        "total_tokens": total_tokens,
        "lineage": lineage,
    }
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, default=str)
    print(json.dumps(manifest, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
