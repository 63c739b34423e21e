"""Minimal protobuf wire-format parser for XSpace profiler traces.

The environment ships no generated xplane_pb2 (tensorboard_plugin_profile
lacks it and tensorflow's pywrap helper is ABI-broken), so this decodes
the few fields we need straight from the wire format:

  XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(4)}
  XLine.events(4)  -> XEvent{metadata_id(1), duration_ps(3)}
  map entry        -> {key(1), value(2=XEventMetadata{name(2)})}

Usage:
  python experiments/xplane_parse.py <trace_dir_or_xplane.pb> [top]
prints per-op-name total device time, plus a bucket rollup (fusion /
copy / conv / custom-call / all-reduce / other) for TPU planes.
"""

from __future__ import annotations

import glob
import os
import re
import sys


def _varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:  # groups unused in xplane
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf: bytes):
    name = ""
    lines = []
    meta = {}
    for fn, _, v in fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(v)
        elif fn == 4:  # map<int64, XEventMetadata>
            k = None
            mname = ""
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    for f3, _, v3 in fields(v2):
                        if f3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if k is not None:
                meta[k] = mname
    return name, lines, meta


def plane_op_totals(buf: bytes):
    """Aggregate event durations (ms) by op name for one plane."""
    name, lines, meta = parse_plane(buf)
    totals: dict[str, float] = {}
    for lbuf in lines:
        for fn, _, v in fields(lbuf):
            if fn != 4:
                continue
            mid = 0
            dur = 0
            for f2, wt2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3 and wt2 == 0:
                    dur = v2
            op = meta.get(mid, f"#{mid}")
            totals[op] = totals.get(op, 0.0) + dur / 1e9
    return name, totals


def resolve_xplane(path: str) -> str:
    """Latest .xplane.pb under a trace dir (or the file itself)."""
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(f"{path}/**/*.xplane.pb", recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            raise FileNotFoundError(f"no .xplane.pb under {path}")
        return cands[-1]
    return path


def event_durations(path: str, name_rx: str):
    """Per-EVENT durations (ms) on device planes for events whose metadata
    name matches `name_rx` — e.g. the jitted module name gives one event
    per step execution, i.e. the TRUE device-side step-time distribution
    (bench.py's step_time_ms_p50/p95; VERDICT r3 weak 5)."""
    rx = re.compile(name_rx)
    buf = open(resolve_xplane(path), "rb").read()
    out = []
    for fn, _, v in fields(buf):
        if fn != 1:
            continue
        pname, lines, meta = parse_plane(v)
        if "TPU" not in pname and "Device" not in pname:
            continue
        for lbuf in lines:
            for fn2, _, v2 in fields(lbuf):
                if fn2 != 4:
                    continue
                mid = 0
                dur = 0
                for f2, wt2, v3 in fields(v2):
                    if f2 == 1:
                        mid = v3
                    elif f2 == 3 and wt2 == 0:
                        dur = v3
                if rx.search(meta.get(mid, "")):
                    out.append(dur / 1e9)
    return out


_OP_RX = re.compile(r"^%([a-zA-Z][\w-]*?)(?:[.\d]*)\s*=")

_BUCKETS = [
    ("copy", re.compile(r"^(copy|bitcast|transpose|slice)")),
    ("conv", re.compile(r"^(convolution|conv)")),
    ("pallas", re.compile(r"custom-call|tpu_custom_call")),
    ("allreduce", re.compile(r"all-reduce|reduce-scatter|all-gather")),
    ("fusion", re.compile(r"^fusion")),
    ("dynamic", re.compile(r"dynamic")),
]


def op_kind(op: str):
    """HLO op kind from an event name like '%copy-start.943 = ...'; None
    for non-op events (module/step lines)."""
    m = _OP_RX.match(op)
    return m.group(1) if m else None


def bucket(kind: str) -> str:
    for bname, rx in _BUCKETS:
        if rx.search(kind):
            return bname
    return "other"


def main(path: str, top: int = 40):
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(f"{path}/**/*.xplane.pb", recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            print("no .xplane.pb found under", path)
            return
        path = cands[-1]
    buf = open(path, "rb").read()
    print(f"# {path} ({len(buf)/1e6:.1f} MB)")
    for fn, _, v in fields(buf):
        if fn != 1:
            continue
        pname, totals = plane_op_totals(v)
        if "TPU" not in pname and "Device" not in pname:
            continue
        ops = {op: ms for op, ms in totals.items() if op_kind(op)}
        tot = sum(ops.values())
        if tot == 0:
            continue
        print(f"\n== plane: {pname}  op-level total {tot:.2f} ms ==")
        buckets: dict[str, float] = {}
        kinds: dict[str, float] = {}
        for op, ms in ops.items():
            k = op_kind(op)
            buckets[bucket(k)] = buckets.get(bucket(k), 0.0) + ms
            kinds[k] = kinds.get(k, 0.0) + ms
        for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  [{b:>9}] {ms:9.2f} ms  ({100*ms/tot:4.1f}%)")
        print("  -- by op kind --")
        for k, ms in sorted(kinds.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {ms:9.2f} ms  {k}")
        print("  -- top ops --")
        for op, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms  {op[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vct_profile",
         int(sys.argv[2]) if len(sys.argv) > 2 else 40)
