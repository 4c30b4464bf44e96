"""Profiler-trace summarizer: where does a step actually go?

Parses the Chrome-format trace written by `jax.profiler.trace` /
FSD_PROFILE_DIR (utils/profiling.trace) and prints per-op-category and
top-op time tables for the device timeline — the analysis that drove the
round-2 roofline work (PERF.md "Where a b384 step goes").

    python -m fewshot_detection_tpu.utils.trace_summary <trace_dir> [--top N]

The reference's only tracing was stopwatch prints behind `if False:` flags
(train.py:179-223 in /root/reference); this pairs the always-on StepTimer
with real device-op attribution.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace_files(trace_dir: str) -> list[str]:
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    out: list[str] = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(out)


def load_events(path: str) -> list[dict]:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def summarize(events: list[dict], device_substr: str = "TPU") -> dict:
    """Aggregate complete ('X') events on device process timelines.

    Returns {"categories": {base_name: us}, "ops": {name: us},
             "counts": {name: n}, "total_us": float, "device": str}.
    """
    names = {
        e["pid"]: str(e["args"].get("name", ""))
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {
        pid for pid, n in names.items()
        if device_substr.lower() in n.lower() or "/device:" in n
    }
    # fall back to any non-CPU pid when the device name doesn't match
    if not device_pids:
        device_pids = {
            pid for pid, n in names.items() if "cpu" not in n.lower()
        }
    cats: collections.Counter = collections.Counter()
    ops: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e.get("pid") not in device_pids:
            continue
        n = e["name"]
        # skip enclosing step/module markers (they double-count their ops)
        if n.startswith("jit_") or n.isdigit():
            continue
        ops[n] += e["dur"]
        counts[n] += 1
        cats[re.sub(r"[.\d]+$", "", n) or n] += e["dur"]
    dev = ", ".join(sorted(names[p] for p in device_pids)) or "?"
    return {
        "categories": dict(cats),
        "ops": dict(ops),
        "counts": dict(counts),
        "total_us": float(sum(ops.values())),
        "device": dev,
    }


def format_summary(s: dict, top: int = 15) -> str:
    total = max(s["total_us"], 1e-9)
    lines = [f"device timeline: {s['device']}  total {total / 1e3:.2f} ms"]
    lines.append("-- categories --")
    for n, d in sorted(s["categories"].items(), key=lambda kv: -kv[1])[:top]:
        lines.append(f"{d / 1e3:10.2f} ms  {100 * d / total:5.1f}%  {n or '(unnamed)'}")
    lines.append(f"-- top {top} ops --")
    for n, d in sorted(s["ops"].items(), key=lambda kv: -kv[1])[:top]:
        lines.append(
            f"{d / 1e3:10.2f} ms  x{s['counts'][n]:<5d} {n[:90]}"
        )
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("Usage: python -m fewshot_detection_tpu.utils.trace_summary "
              "<trace_dir> [--top N]")
        return 1
    top = 15
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    files = find_trace_files(argv[0])
    if not files:
        print(f"no trace files under {argv[0]}")
        return 1
    for f in files:
        print(f"== {f}")
        print(format_summary(summarize(load_events(f)), top=top))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
