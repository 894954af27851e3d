"""Per-(sink, batch) commit-marker protocol — the replay-idempotence
bookkeeping shared by every foreachBatch sink in this package
(``stream_pipeline.run_stream`` flat-append sinks, ``stateful._append_once``
partition-overwrite sinks).

The protocol (reference analog: the buffered flush + re-queue-on-failure
loop, ``modules/kafka/consumer/consumer.go:277-329``, re-expressed as
at-least-once append + marker dedup):

1. data is committed FIRST, the marker is written SECOND (atomic
   tmp+``os.replace``) — so a marker's existence proves its data landed;
2. a replayed batch is skipped only when both the batch id AND the input
   signature match — a checkpoint wipe re-numbers batches from 0 with
   different content, and a batch_id-only marker would silently drop them
   (ADVICE r2);
3. an EMPTY marker is the legacy existence-only format (pre-signature):
   the old contract was "marker present → committed", honored so a
   crash-restart upgrading mid-stream never re-appends.

One definition so the compaction pass (``plans.sinks.compact_sink``), the
replay tests, and any future hardening see a single protocol.
"""

from __future__ import annotations

import os

MARKER_DIR = "_batches"


def marker_file(dest: str, batch_id: int) -> str:
    """Path of the commit marker for ``batch_id`` under sink dir ``dest``."""
    return os.path.join(dest, MARKER_DIR, f"{batch_id}.done")


def marker_committed(dest: str, batch_id: int, sig: str) -> bool:
    """True iff ``batch_id`` already committed under ``dest`` with the same
    input signature (or a legacy empty marker — see module docstring)."""
    marker = marker_file(dest, batch_id)
    if not os.path.exists(marker):
        return False
    with open(marker) as fh:
        content = fh.read().strip()
    return content == "" or content == sig


def write_marker(dest: str, batch_id: int, sig: str) -> None:
    """Atomically record ``batch_id`` as committed (tmp + ``os.replace``):
    the signature is load-bearing for replay-skip, so a crash mid-write must
    never leave a truncated marker that re-triggers — or worse, permanently
    suppresses — the append."""
    marker = marker_file(dest, batch_id)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(sig)
    os.replace(tmp, marker)
