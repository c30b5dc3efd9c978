"""Measured step anatomy from a jax.profiler trace.

The reference *measures* its wall-time split every run - compute /
compute-overlap / wait-communication / wait-computation accumulated per
step (reference include/lbm3d/state.h:278-279, state.hpp:1285-1300) plus
MPI bandwidth lines every 100 iterations (lbm.hpp:238-279).  The TPU-native
analog cannot instrument inside the XLA schedule, but the profiler trace
records every device op with timestamps; this module reduces a captured
trace to the same four-way split:

- ``compute``   - device-busy time in non-communication XLA ops
- ``comm_overlapped`` - collective time hidden under concurrent compute
- ``comm_exposed``    - collective time with no compute running (the
  analog of the reference's wait-communication)
- ``copy``      - explicit copy/transpose ops (HBM reshuffles)

Works on TPU device planes and on CPU (virtual multi-device) executor
lines, so the sharded-step anatomy is testable without hardware.  Parsing
uses TensorFlow's bundled ``xplane_pb2`` (imported lazily - TF import is
slow and only needed when a trace is actually analyzed).
"""

from __future__ import annotations

import glob
import json
import os
from pathlib import Path

# HLO/op-name patterns -> category (checked in order)
_COMM_TOKENS = (
    "collective-permute", "all-reduce", "all-gather", "reduce-scatter",
    "all-to-all", "collective-broadcast", "partition-id", "send", "recv",
    "ragged-all-to-all",
    # source-scope names XLA propagates from jax (halo exchanges call
    # lax.ppermute) and the CPU backend's collective internals
    "ppermute", "psum", "rendezvous", "wait:",
)
_COPY_TOKENS = ("copy", "transpose")


def classify_op(name: str) -> str:
    low = name.lower()
    for tok in _COMM_TOKENS:
        if tok in low:
            return "comm"
    for tok in _COPY_TOKENS:
        if low.startswith(tok):
            return "copy"
    return "compute"


def _find_xplane(trace_dir) -> str:
    pbs = sorted(glob.glob(os.path.join(os.fspath(trace_dir), "**",
                                        "*.xplane.pb"), recursive=True),
                 key=os.path.getmtime)
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    return pbs[-1]


def _load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: TF is slow

    xs = xplane_pb2.XSpace()
    with open(_find_xplane(trace_dir), "rb") as fh:
        xs.ParseFromString(fh.read())
    return xs


def _device_op_events(xs):
    """Yield (plane_key, op_name, start_ps, duration_ps) for XLA op events.

    TPU traces: per-chip planes named ``/device:TPU:N`` (op events live on
    the "XLA Ops" lines).  CPU traces: XLA thunk executor lines on the
    ``/host:CPU`` plane (one line per executor thread, named
    ``tf_XLA...``); the scheduler-level ``ThunkExecutor::Execute`` spans
    and Python lines are skipped.
    """
    for plane in xs.planes:
        is_device = plane.name.startswith("/device:")
        is_host = plane.name == "/host:CPU"
        if not (is_device or is_host):
            continue
        md = plane.event_metadata
        # A TPU device plane carries several lines: "XLA Ops" (individual
        # HLO ops - what we want), "XLA Modules" (ONE event spanning the
        # whole executable per dispatch - counting it would double compute
        # and blanket every collective as "overlapped"), "Steps", etc.
        # When an ops line exists, use ONLY it; the substring fallback
        # covers trace formats without one.
        ops_lines = [ln.name for ln in plane.lines
                     if is_device and "xla ops" in ln.name.lower()]
        for line in plane.lines:
            if is_device and ops_lines and line.name not in ops_lines:
                continue
            if is_device and not ops_lines and (
                    "step" in line.name.lower()
                    or "module" in line.name.lower()):
                continue  # step markers / whole-executable spans, not ops
            if is_host and not line.name.startswith("tf_XLA"):
                continue
            key = plane.name if is_device else f"{plane.name}/{line.name}"
            ts_ps = line.timestamp_ns * 1000
            for e in line.events:
                name = md[e.metadata_id].name
                if name.startswith("ThunkExecutor"):
                    continue
                yield key, name, ts_ps + e.offset_ps, e.duration_ps


def _merge_intervals(iv):
    iv.sort()
    out = []
    for s, e in iv:
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def _overlap(ev_s, ev_e, merged) -> int:
    """Overlap of [ev_s, ev_e) with a merged interval list (ps)."""
    import bisect

    total = 0
    i = bisect.bisect_right(merged, [ev_s, float("inf")]) - 1
    i = max(i, 0)
    while i < len(merged) and merged[i][0] < ev_e:
        s, e = merged[i]
        total += max(0, min(e, ev_e) - max(s, ev_s))
        i += 1
    return total


def step_anatomy(trace_dir, top_k: int = 12) -> dict:
    """Reduce a jax.profiler trace to the reference's wall-time split.

    Returns a dict with per-category totals in milliseconds (summed over
    device planes), the comm overlapped/exposed decomposition, and the
    top-k ops by device time.
    """
    xs = _load_xspace(trace_dir)
    per_plane = {}
    for key, name, start, dur in _device_op_events(xs):
        per_plane.setdefault(key, []).append((name, start, dur))

    cat_ps = {"compute": 0, "comm": 0, "copy": 0}
    comm_overlapped = 0
    by_op = {}
    busy_union_ps = 0
    for key, events in per_plane.items():
        compute_iv = []
        for name, start, dur in events:
            cat = classify_op(name)
            cat_ps[cat] += dur
            by_op[name] = by_op.get(name, 0) + dur
            if cat != "comm":
                compute_iv.append([start, start + dur])
        merged = _merge_intervals(compute_iv)
        busy_union_ps += sum(e - s for s, e in merged)
        for name, start, dur in events:
            if classify_op(name) == "comm":
                comm_overlapped += _overlap(start, start + dur, merged)

    ms = 1e-9  # ps -> ms
    comm = cat_ps["comm"]
    out = {
        "planes": sorted(per_plane),
        "compute_ms": cat_ps["compute"] * ms,
        "copy_ms": cat_ps["copy"] * ms,
        "comm_ms": comm * ms,
        "comm_overlapped_ms": comm_overlapped * ms,
        "comm_exposed_ms": (comm - comm_overlapped) * ms,
        "overlap_fraction": (comm_overlapped / comm) if comm else 1.0,
        "device_busy_ms": busy_union_ps * ms,
        "top_ops_ms": dict(sorted(by_op.items(), key=lambda kv: -kv[1])[:top_k]),
    }
    out["top_ops_ms"] = {k: v * ms for k, v in out["top_ops_ms"].items()}
    return out


def format_anatomy(a: dict) -> str:
    """One reference-style log line (state.hpp:1285-1300 analog)."""
    return (
        "wall-time split (trace-measured): compute %.2f ms, "
        "comm %.2f ms (%.0f%% overlapped, %.2f ms exposed), copy %.2f ms, "
        "device busy %.2f ms over %d plane(s)"
        % (a["compute_ms"], a["comm_ms"], 100.0 * a["overlap_fraction"],
           a["comm_exposed_ms"], a["copy_ms"], a["device_busy_ms"],
           len(a["planes"]))
    )


def write_summary(trace_dir, out_path) -> dict | None:
    """Parse ``trace_dir`` and write a JSON summary; returns the dict or
    None when parsing is unavailable (no TF in the runtime image)."""
    try:
        a = step_anatomy(trace_dir)
    except Exception:
        return None
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(a, fh, indent=1)
    return a
