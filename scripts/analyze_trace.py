"""Aggregate a jax.profiler TPU trace (vm.xplane.pb) by op kind and shape.

The raw trace nests every scan-body op under a `%while` container event, so
naive summing double-counts; this drops containers and groups LEAF events.
Use after `python bench.py --profile DIR`:

    python scripts/analyze_trace.py DIR            # op-kind totals
    python scripts/analyze_trace.py DIR --kind copy  # per-shape breakdown

This is how the round-2/3 findings were produced: the 46%-of-device-time
scalarized gather in parity mode, and the 21% copy bucket named as
attention K/V head-split relayouts (docs/PERF.md).
"""

import argparse
import collections
import glob
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", help="dir passed to bench.py --profile")
    ap.add_argument("--kind", default=None,
                    help="break one op kind down by result shape/layout")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{args.trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}/plugins/profile/")
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(sorted(paths)[-1], "rb").read())
    planes = [p for p in sp.planes if "TPU" in p.name]
    if not planes:
        sys.exit(f"no TPU plane; planes: {[p.name for p in sp.planes]}")
    plane = planes[0]
    ev_names = {i: m.name for i, m in plane.event_metadata.items()}

    agg = collections.Counter()
    cnt = collections.Counter()
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_names.get(ev.metadata_id, "?")
            if name.startswith("%while"):
                continue              # container: children counted directly
            d = ev.duration_ps / 1e6  # us
            if args.kind:
                m = re.match(rf"%{args.kind}[.\d]* = (\S+)", name)
                if not m:
                    continue
                key = m.group(1)
            else:
                m = re.match(r"%([a-zA-Z_\-]+)", name)
                key = m.group(1) if m else "?"
            agg[key] += d
            cnt[key] += 1

    total = sum(agg.values())
    label = f"'{args.kind}' ops by shape" if args.kind else "leaf ops by kind"
    print(f"{plane.name}: {label}; total {total / 1e3:.1f} ms "
          f"over {sum(cnt.values())} events")
    for key, d in agg.most_common(args.top):
        print(f"  {d / 1e3:8.2f}ms {100 * d / total:5.1f}% "
              f"x{cnt[key]:<7} {key[:100]}")


if __name__ == "__main__":
    main()
