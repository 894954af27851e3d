#!/usr/bin/env python
"""spark-submit entry point for the corpus-assembly pipeline.

Runs the training-data prep chain (quality gate → exact dedup →
cluster-resolved near-dup dedup → per-language stratified sample →
per-shard sequence packing — ONE definition shared with the registry's
driver-verified dp4 entry, see ``plans/corpus_prep.py``) and writes each
stage's keep-set plus the packed bins, with a manifest of per-stage row
counts for lineage.

Cluster usage::

    zip -r engine.zip otel_kafka_pg_spark
    spark-submit --py-files engine.zip jobs/corpus_prep.py \
        --input  <documents parquet path> \
        --output <out root> \
        [--quality-min 0.5] [--near-threshold 0.6] [--per-stratum 25] \
        [--shard-size 128] [--token-budget 512]

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path (doc_id, text, lang, …)")
    ap.add_argument("--output", required=True, help="output root directory")
    ap.add_argument("--quality-min", type=float, default=0.5)
    ap.add_argument("--near-threshold", type=float, default=0.6)
    ap.add_argument("--per-stratum", type=int, default=25)
    ap.add_argument("--shard-size", type=int, default=128)
    ap.add_argument("--token-budget", type=int, default=512)
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

    from otel_kafka_pg_spark.plans.corpus_prep import corpus_prep_stages

    docs = spark.read.parquet(args.input)
    stages = corpus_prep_stages(
        spark,
        docs,
        quality_min=args.quality_min,
        near_threshold=args.near_threshold,
        per_stratum=args.per_stratum,
        shard_size=args.shard_size,
        token_budget=args.token_budget,
    )

    counts: dict[str, int] = {"input": docs.count()}
    # intermediate keep-sets persist as id lists (tiny, rejoinable against
    # the source); the packed bins are the deliverable
    for name in ("gated", "kept", "reps", "sample"):
        dest = os.path.join(args.output, name)
        frame = stages[name].select("doc_id")
        frame.write.mode("overwrite").parquet(dest)
        counts[name] = spark.read.parquet(dest).count()
    packed_dest = os.path.join(args.output, "packed")
    stages["packed"].write.mode("overwrite").parquet(packed_dest)
    packed = spark.read.parquet(packed_dest)
    counts["packed_bins"] = packed.count()
    total_tokens = packed.agg({"total_tokens": "sum"}).collect()[0][0]

    manifest = {
        "input": args.input,
        "params": {
            "quality_min": args.quality_min,
            "near_threshold": args.near_threshold,
            "per_stratum": args.per_stratum,
            "shard_size": args.shard_size,
            "token_budget": args.token_budget,
        },
        "counts": counts,
        "total_tokens": total_tokens,
    }
    with open(os.path.join(args.output, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, default=str)
    print(json.dumps(manifest, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
