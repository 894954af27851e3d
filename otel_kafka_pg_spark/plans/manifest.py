"""Checkpoint manifest: per-partition lineage + row counts + content hashes.

The reference gets at-least-once delivery from Kafka auto-commit plus
re-buffer-on-failure (reference: consumer.go:91-92, :306-324) and converts
it to effectively-once via primary-key upserts (log/repository/
repository.go:67-88). Our batch analog: deterministic row IDs + a JSON
manifest recording, per sink, the row count, an order-insensitive content
hash, and per-Spark-partition lineage. A resumed run skips sinks already
marked complete for the same input fingerprint — idempotent resume of
partially completed routes.

The content hash is ``bit_xor(xxhash64(row))`` — commutative, so it is
independent of partitioning and task scheduling; two datasets hash equal iff
they contain the same multiset of rows (xor cancels duplicates pairwise;
combined with the row count this is collision-safe for our purposes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def _row_hash(df: DataFrame):
    return F.xxhash64(*[F.col(c).cast("string") for c in df.columns])


def content_hash(df: DataFrame) -> tuple[int, int]:
    """(rows, order-insensitive content hash) in one aggregate pass."""
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.bit_xor(_row_hash(df)), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["rows"]), int(row["h"])


def write_with_summary(df: DataFrame, dest: str) -> tuple[int, int, list[dict]]:
    """Write parquet and return (rows, content hash, per-partition lineage)
    with ZERO extra Spark jobs:

    - rows + order-insensitive xor-hash ride along the write job itself via
      ``DataFrame.observe`` (computed on the exact rows written);
    - per-partition lineage comes from the parquet footers of the written
      files — a driver-side metadata read (each output file is one write
      task's partition).

    The previous design re-read every sink and ran an aggregate pass —
    2 extra jobs per sink; at 10^12 rows that's re-scanning the whole output.

    Caveat (and its guard): ``observe`` accumulators can double-count under
    task retries / speculative execution (rows over-counted; the xor hash
    self-cancels re-executed partitions). The parquet footers record what
    was actually COMMITTED, so the observed row count is validated against
    the footer total; on mismatch (a retry happened) the summary falls back
    to one exact read-back aggregate over the written files — correctness
    never depends on retry-free execution, the fast path just assumes it.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.bit_xor(_row_hash(df)), F.lit(0)).alias("h"),
    )
    observed.write.mode("overwrite").parquet(dest)
    metrics = obs.get
    lineage = parquet_file_lineage(dest)
    committed_rows = sum(p["rows"] for p in lineage)
    if int(metrics["rows"]) != committed_rows:
        # a task retry skewed the accumulators — recompute exactly from the
        # committed files (2 extra jobs, but only on the rare retry path)
        spark = df.sparkSession
        rows, h = content_hash(spark.read.parquet(dest))
        return rows, h, lineage
    return int(metrics["rows"]), int(metrics["h"]), lineage


def parquet_file_lineage(dest: str) -> list[dict]:
    """Per-output-file row counts from parquet footer metadata (no job).
    Recursive listing so hive-partitioned sink layouts (partitionBy) keep
    working; file order is the sorted relative path (deterministic).

    Filesystem-abstracted via ``pyarrow.fs``: a plain path uses the local
    filesystem, a URI (``s3://…``, ``hdfs://…``) resolves to the matching
    pyarrow filesystem — footer reads go through the same handle, so an
    object-store sink gets identical lineage without code changes (``s3a://``
    spark URIs map to pyarrow's ``s3://``). The manifest schema is
    identical either way."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    if "://" in dest:
        filesystem, root = pafs.FileSystem.from_uri(dest.replace("s3a://", "s3://", 1))
    else:
        filesystem, root = pafs.LocalFileSystem(), dest
    infos = [
        i
        for i in filesystem.get_file_info(pafs.FileSelector(root, recursive=True))
        if i.is_file and i.path.endswith(".parquet")
    ]
    infos.sort(key=lambda i: os.path.relpath(i.path, root))
    return [
        {"partition_id": idx, "rows": pq.read_metadata(i.path, filesystem=filesystem).num_rows}
        for idx, i in enumerate(infos)
    ]


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-Spark-partition row counts — the lineage record each partition
    emits (north-rule requirement; analog of the reference's per-flush count
    log lines consumer.go:302,316)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("partition_id")
        .collect()
    )
    return [{"partition_id": int(r["partition_id"]), "rows": int(r["rows"])} for r in rows]


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def load_manifest(out_dir: str) -> dict:
    p = manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"input_fingerprint": None, "sinks": {}}


def save_manifest(out_dir: str, manifest: dict) -> None:
    """Atomic write (tmp + rename) so a crash never leaves a torn manifest."""
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path(out_dir))


def input_fingerprint(path: str) -> str:
    """Deterministic identity of an input dataset: relative file paths +
    sizes, listed RECURSIVELY (hive-partitioned inputs keep their data under
    ``key=value/`` subdirectories) and through pyarrow's filesystem layer so
    ``s3a://…``/``hdfs://…`` URIs fingerprint the same way local paths do.

    The fingerprint always embeds the NORMALIZED input root (abspath for
    local paths, scheme-normalized URI otherwise), never the caller's
    literal spelling: ``data/in`` and ``/abs/data/in`` must resume each
    other. An unlistable or empty input must never share a fingerprint
    with a different unlistable or empty input, otherwise resume would
    treat them as the same dataset and skip all work (the "" == ""
    false-match) — but "unlistable" means a REAL listing error, reported
    loudly; a missing pyarrow falls back to ``os``-level listing for
    local paths rather than silently disabling resume forever.
    """
    is_uri = "://" in path
    norm = path.replace("s3a://", "s3://", 1) if is_uri else os.path.abspath(path)
    parts = [f"path={norm}"]
    try:
        import pyarrow.fs as pafs
    except ImportError:
        if is_uri:
            # cannot list a remote filesystem without pyarrow — unmatchable
            # nonce (resume rewrites), and say so instead of silently looping
            print(
                f"[manifest] pyarrow unavailable; cannot fingerprint remote input {norm!r} "
                "— resume disabled for this run",
                file=sys.stderr,
            )
            parts.append(f"unlistable:{os.urandom(8).hex()}")
        elif os.path.isfile(norm):
            parts.append(f"{os.path.basename(norm)}:{os.path.getsize(norm)}")
        elif os.path.isdir(norm):
            entries = []
            for dirpath, _dirs, files in os.walk(norm):
                for base in files:
                    if base.startswith(("_", ".")):
                        continue
                    full = os.path.join(dirpath, base)
                    entries.append(f"{os.path.relpath(full, norm)}:{os.path.getsize(full)}")
            parts.extend(sorted(entries))
        else:
            parts.append("missing")
        return "|".join(parts)
    try:
        filesystem, root = pafs.FileSystem.from_uri(norm)
        info = filesystem.get_file_info(root)
        if info.type == pafs.FileType.File:
            parts.append(f"{os.path.basename(root)}:{info.size}")
        elif info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(root, recursive=True)
            for fi in sorted(filesystem.get_file_info(sel), key=lambda fi: fi.path):
                base = os.path.basename(fi.path)
                if fi.type == pafs.FileType.File and not base.startswith(("_", ".")):
                    rel = fi.path[len(root):].lstrip("/")
                    parts.append(f"{rel}:{fi.size}")
        else:
            parts.append("missing")
    except Exception as exc:  # noqa: BLE001 — unlistable input: never match
        # anything stored, so resume REWRITES rather than silently skipping
        # work over data it cannot identify (a per-call nonce keeps it
        # unmatchable) — and the cause is printed, not swallowed, so a
        # permanent environment defect (bad credentials, wrong URI) shows up
        # as a message per run instead of an unexplained full-rewrite loop
        print(
            f"[manifest] input {norm!r} unlistable ({type(exc).__name__}: {exc}) "
            "— resume disabled for this run",
            file=sys.stderr,
        )
        parts.append(f"unlistable:{os.urandom(8).hex()}")
    return "|".join(parts)
