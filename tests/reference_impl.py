"""Independent pure-Python/pandas re-implementation of the pipeline semantics.

This is the parity oracle for the routed-row-set equality and per-sink
aggregate-count gates. It deliberately shares NO code with the engine:
per-row Python ``re`` instead of Spark expressions or vectorized pandas
extraction, plain dict merges instead of map_concat, hashlib instead of
F.sha2. Slow, but only run on small fixtures.

Semantics mirrored from the reference Go implementation:
- severity text token wins, else number map {1,5,9,13,17,21}, default INFO
  (modules/kafka/processor/processor.go:249-255, log/domain/log.go:32-46)
- status OK/ERROR from call marker else UNSET (processor.go:121-130)
- trace attrs: resource wins (processor.go:116-119)
- log/metric attrs: record wins (processor.go:213-218)
- trace id = "<trace>-<span>" (processor.go:134)
- log/metric id = sha256 of content (processor.go:348-367, minus the
  wall-clock entropy at :362 — the documented deterministic fix)
"""

from __future__ import annotations

import hashlib
import json
import re

import pandas as pd

SEV_MAP = {1: "TRACE", 5: "DEBUG", 9: "INFO", 13: "WARN", 17: "ERROR", 21: "FATAL"}

RE_TRACE = re.compile(r"trace=([0-9a-f]{32})")
RE_SPAN = re.compile(r"span=([0-9a-f]{16})")
RE_PARENT = re.compile(r"parent=([0-9a-f]{16})")
RE_SEV_TOK = re.compile(r"(?<!status=)\b(TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\b")
RE_SEV_NUM = re.compile(r"severity_number=([0-9]+)")
RE_CALL = re.compile(r"call:([A-Za-z_][A-Za-z0-9_]*)\(")
RE_STATUS = re.compile(r"status=(OK|ERROR)")
RE_DUR = re.compile(r"dur=([0-9.]+)ms")
RE_METRIC = re.compile(r"metric:([A-Za-z_][A-Za-z0-9_]*)=([-0-9.]+)")
RE_STRIP = re.compile(
    r"(trace=[0-9a-f]{32}|span=[0-9a-f]{16}|parent=[0-9a-f]{16}"
    r"|call:[A-Za-z_][A-Za-z0-9_]*\([^)]*\)|status=(?:OK|ERROR)|dur=[0-9.]+ms"
    r"|severity_number=[0-9]+|metric:[A-Za-z_][A-Za-z0-9_]*=[-0-9.]+"
    r"|\b(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)\b)"
)


def _first(rx, text):
    m = rx.search(text)
    return m.group(1) if m else ""


def _canon(d: dict) -> str:
    return json.dumps(d, sort_keys=True, separators=(",", ":"))


def _sha(kind: str, conv_id: str, turn_idx: int, ms: int) -> str:
    return hashlib.sha256(f"{kind}|{conv_id}|{turn_idx}|{ms}".encode()).hexdigest()


def route_reference(transcripts: pd.DataFrame, lookup: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Run parse → enrich → route → count, row-at-a-time. Returns the four
    sink frames keyed 'traces' / 'logs' / 'metrics' / 'sink_counts'."""
    lk = {(r.tool, r.role): (r.service_name, r.resource_attrs) for r in lookup.itertuples()}
    traces, logs, metrics, count_keys = [], [], [], {}
    for r in transcripts.itertuples():
        text = r.text
        trace_id = _first(RE_TRACE, text)
        span_id = _first(RE_SPAN, text)
        sev_tok = _first(RE_SEV_TOK, text)
        if sev_tok:
            severity = sev_tok
        else:
            num = _first(RE_SEV_NUM, text)
            severity = SEV_MAP.get(int(num), "INFO") if num else "INFO"
        status = _first(RE_STATUS, text) or "UNSET"
        call_tool = _first(RE_CALL, text)
        dur_s = _first(RE_DUR, text)
        dur = float(dur_s) if dur_s else None
        mm = RE_METRIC.search(text)
        metric_name, metric_value = (mm.group(1), float(mm.group(2))) if mm else ("", None)
        message = re.sub(r"\s+", " ", RE_STRIP.sub("", text)).strip()
        tool = r.tool if isinstance(r.tool, str) else None

        svc, res_json = lk.get((tool, r.role), ("unknown", "{}"))
        resource = json.loads(res_json)
        record = {"role": r.role, "severity": severity, "status": status, "source": "record"}
        if call_tool:
            record["call.tool"] = call_tool
        if tool is not None:
            record["tool"] = tool
        ms = int(r.ts.value // 1_000_000)

        if trace_id and span_id:
            signal = "trace"
            attrs = {**record, **resource}  # resource wins
            d = dur if dur is not None else 0.0
            traces.append(
                {
                    "id": f"{trace_id}-{span_id}",
                    "trace_id": trace_id,
                    "span_id": span_id,
                    "parent_span_id": _first(RE_PARENT, text),
                    "name": call_tool or "unknown",
                    "service_name": svc,
                    "start_time": ms,
                    "end_time": ms + int(d),
                    "duration": d,
                    "status": status,
                    "attributes": _canon(attrs),
                    "conv_id": r.conv_id,
                    "turn_idx": r.turn_idx,
                }
            )
        elif metric_name:
            signal = "metric"
            attrs = {**resource, **record}  # record wins
            metrics.append(
                {
                    "id": _sha("metric", r.conv_id, r.turn_idx, ms),
                    "metric_name": metric_name,
                    "type": "gauge",
                    "service_name": svc,
                    "timestamp": ms,
                    "value": metric_value,
                    "attributes": _canon(attrs),
                    "conv_id": r.conv_id,
                    "turn_idx": r.turn_idx,
                }
            )
        else:
            signal = "log"
            attrs = {**resource, **record}  # record wins
            logs.append(
                {
                    "id": _sha("log", r.conv_id, r.turn_idx, ms),
                    "timestamp": ms,
                    "service_name": svc,
                    "message": message,
                    "severity": severity,
                    "trace_id": trace_id,
                    "span_id": span_id,
                    "attributes": _canon(attrs),
                    "conv_id": r.conv_id,
                    "turn_idx": r.turn_idx,
                }
            )
        bucket = r.ts.floor("h")
        key = (signal, r.conv_id, r.role, tool, bucket)
        count_keys[key] = count_keys.get(key, 0) + 1

    counts = pd.DataFrame(
        [
            {"sink": k[0], "conv_id": k[1], "role": k[2], "tool": k[3], "time_bucket": k[4], "n": v}
            for k, v in count_keys.items()
        ]
    )
    return {
        "traces": pd.DataFrame(traces),
        "logs": pd.DataFrame(logs),
        "metrics": pd.DataFrame(metrics),
        "sink_counts": counts,
    }
