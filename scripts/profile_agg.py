"""Aggregate a jax.profiler trace into a per-op device-time breakdown.

Usage:
    python bench.py --profile /tmp/trace
    python scripts/profile_agg.py /tmp/trace [--top 30]

Finds the newest ``*.trace.json.gz`` under the directory, sums
``device_duration_ps`` (falling back to event ``dur``) grouped by the
``tf_op``/name annotation, and prints a sorted table plus coarse buckets
(conv / fft-matmul / pallas / elementwise / other) so regressions in the
headline bench (PERF_NOTES.md breakdowns) are diagnosed in one step.
"""

import argparse
import collections
import glob
import gzip
import json
import os


BUCKETS = (
    ("conv", ("conv",)),
    ("matmul/fft", ("dot", "fft")),
    ("pallas", ("pallas", "custom-call")),
    ("reduce", ("reduce", "argsort", "sort")),
    ("elementwise", ("fusion", "add", "multiply", "subtract", "divide",
                     "maximum", "minimum", "exp", "log", "tanh", "power")),
)


def bucket_of(name: str) -> str:
    low = name.lower()
    for bucket, keys in BUCKETS:
        if any(k in low for k in keys):
            return bucket
    return "other"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    parser.add_argument("--top", type=int, default=30)
    args = parser.parse_args()

    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.trace_dir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # device per-op events live on threads named "XLA Ops" (one per chip);
    # "XLA Modules" spans cover the same time at jit-program granularity and
    # would double-count, host lanes have no device time.
    op_tids = set()
    for ev in trace.get("traceEvents", []):
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and "xla ops" in str(
                    (ev.get("args") or {}).get("name", "")).lower()):
            op_tids.add((ev.get("pid"), ev.get("tid")))

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if op_tids and (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        args_d = ev.get("args") or {}
        dur_ps = args_d.get("device_duration_ps")
        if dur_ps is not None:
            dur_us = float(dur_ps) / 1e6
        elif op_tids:
            dur_us = float(ev.get("dur", 0.0))
        else:
            continue
        tf_op = args_d.get("tf_op")
        if tf_op:
            # scoped path "jit(fitness_impl)/jit(fft):" -> "fft"
            base = str(tf_op).rstrip(":").split("/")[-1]
            if base.startswith("jit(") and base.endswith(")"):
                base = base[4:-1]
        else:
            # strip per-instance suffixes: "fusion.123" -> "fusion"
            base = str(ev.get("name", "?")).split("(")[0].split(".")[0]
        base = base.strip()
        per_op[base] += dur_us
        cat = str(args_d.get("hlo_category", "")).strip()
        per_bucket[cat or bucket_of(base)] += dur_us

    total = sum(per_op.values())
    if total == 0:
        raise SystemExit(f"no device events found in {path}")
    print(f"# {path}")
    print(f"# total device time: {total/1e3:.2f} ms\n")
    print(f"{'op':<48}{'ms':>10}{'%':>8}")
    for name, us in per_op.most_common(args.top):
        print(f"{name[:47]:<48}{us/1e3:>10.2f}{100*us/total:>7.1f}%")
    print()
    print(f"{'bucket':<20}{'ms':>10}{'%':>8}")
    for name, us in per_bucket.most_common():
        print(f"{name:<20}{us/1e3:>10.2f}{100*us/total:>7.1f}%")


if __name__ == "__main__":
    main()
