"""Aggregate device op times from a jax.profiler xplane trace.

Usage: python baselines/analyze_xplane.py /tmp/r4_trace [--steps 3] [--top 30]

Walks the TPU device plane of the newest .xplane.pb under the trace dir,
sums event durations per XLA op on the op-level lines, buckets them by
category (convolution / fusion kinds / copy / etc.), and prints a
per-step breakdown (total divided by --steps). Device-side durations
come from the chip's own counters, so host load does not skew them.
"""
import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(path):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2  # type: ignore
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


CATEGORY_RULES = [
    ("convolution", r"^%?(convolution|conv)"),
    ("dot/matmul", r"^%?(dot|cublas|matmul)"),
    ("copy/transpose", r"^%?(copy|transpose|bitcast)"),
    ("copy-start/done (async)", r"^%?(copy-start|copy-done)"),
    ("all-reduce", r"^%?(all-reduce|all-gather|reduce-scatter|collective)"),
    ("scatter", r"^%?(select-and-scatter|scatter)"),
    ("reduce", r"^%?reduce"),
    ("slice/concat/pad", r"^%?(slice|dynamic-slice|concatenate|pad|dynamic-update)"),
    ("custom-call (pallas)", r"^%?custom-call"),
    ("fusion", r"^%?(fusion|loop_|input_|output_)"),
]


def categorize(name: str) -> str:
    base = name.split(".")[0].lower()
    for cat, pat in CATEGORY_RULES:
        if re.match(pat, base):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default=None,
                    help="substring of the plane line to aggregate "
                         "(default: the busiest op-level line)")
    args = ap.parse_args()

    pbs = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        sys.exit(f"no .xplane.pb under {args.trace_dir}")
    xs = load_xspace(pbs[-1])

    dev_planes = [p for p in xs.planes if "TPU" in p.name or "/device" in p.name]
    if not dev_planes:
        print("planes:", [p.name for p in xs.planes])
        sys.exit("no device plane found")

    for plane in dev_planes:
        ev_meta = plane.event_metadata
        print(f"\n=== plane: {plane.name} ===")
        # pick lines: op-level lines have many short events
        per_line = {}
        for line in plane.lines:
            tot = sum(e.duration_ps for e in line.events)
            per_line[line.name or str(line.id)] = (tot, len(line.events), line)
        for lname, (tot, n, _) in sorted(per_line.items(), key=lambda kv: -kv[1][0]):
            print(f"  line {lname!r}: {tot / 1e12 * 1e3:.1f} ms total, {n} events")

        want = args.line or "XLA Ops"
        if want in per_line:  # exact name wins ("XLA Ops", not "Async XLA Ops")
            cands = [(want, per_line[want])]
        else:
            cands = [
                (lname, v) for lname, v in per_line.items() if want in lname
            ] or [max(per_line.items(), key=lambda kv: kv[1][0])]
        lname, (_, _, line) = max(cands, key=lambda kv: kv[1][0])
        print(f"  aggregating line {lname!r} / {args.steps} steps")

        # per-event stats (bytes accessed / flops) when the profiler
        # recorded them — the roofline inputs (VERDICT r4 item 1: achieved
        # GB/s vs HBM peak per residual bucket)
        stat_meta = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
        by_op = collections.Counter()
        by_cat = collections.Counter()
        occurrences = collections.Counter()
        bytes_op = collections.Counter()
        bytes_cat = collections.Counter()
        flops_op = collections.Counter()
        seen_stats = collections.Counter()
        for e in line.events:
            name = ev_meta[e.metadata_id].name if e.metadata_id in ev_meta else str(e.metadata_id)
            ms = e.duration_ps / 1e12 * 1e3
            by_op[name] += ms
            occurrences[name] += 1
            by_cat[categorize(name)] += ms
            for st in e.stats:
                key = stat_meta.get(st.metadata_id, str(st.metadata_id))
                seen_stats[key] += 1
                # XStat carries its value as a oneof directly on the stat
                # (int64_value / uint64_value / double_value / ...)
                which = st.WhichOneof("value")
                v = getattr(st, which) if which else 0
                if isinstance(v, (bytes, str)):
                    continue
                if key in ("bytes_accessed", "memory_bandwidth_util",
                           "bytes accessed"):
                    if key.startswith("bytes"):
                        bytes_op[name] += v
                        bytes_cat[categorize(name)] += v
                elif key == "flops":
                    flops_op[name] += v

        total = sum(by_cat.values())
        print(f"\n  total device op time: {total:.1f} ms "
              f"({total / args.steps:.1f} ms/step)")
        if seen_stats:
            print("  event stat keys seen:", dict(seen_stats.most_common(12)))
        print("\n  by category (ms/step, GB/step, achieved GB/s):")
        for cat, ms in by_cat.most_common():
            gb = bytes_cat.get(cat, 0) / 1e9 / args.steps
            bw = (bytes_cat.get(cat, 0) / 1e9) / (ms / 1e3) if ms else 0.0
            print(f"    {cat:28s} {ms / args.steps:8.2f} {gb:8.2f} {bw:8.1f}")
        print(f"\n  top {args.top} ops (ms/step, count/step, GB/s, TF/s):")
        for name, ms in by_op.most_common(args.top):
            bw = (bytes_op.get(name, 0) / 1e9) / (ms / 1e3) if ms else 0.0
            tf = (flops_op.get(name, 0) / 1e12) / (ms / 1e3) if ms else 0.0
            print(
                f"    {ms / args.steps:8.2f}  x{occurrences[name] / args.steps:4.1f}"
                f"  {bw:7.1f} {tf:6.1f}  {name[:80]}"
            )


if __name__ == "__main__":
    main()
