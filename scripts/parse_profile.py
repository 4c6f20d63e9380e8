"""Summarize a jax.profiler trace (xplane.pb) captured by
`NEURALUDF_BENCH_PROFILE=/tmp/trace python bench.py`.

Parses the xplane protobuf directly (the tensorboard_plugin_profile
converter in this image is incompatible with its tensorflow build) and
prints self-time by HLO op and by category, so kernel work can be aimed
at what actually dominates the step.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/parse_profile.py /tmp/trace [--top 30]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(log_dir: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {log_dir}")
    return hits[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default=None,
                    help="only sum events on lines whose name contains this")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(find_xplane(args.log_dir), "rb") as f:
        space.ParseFromString(f.read())

    print("planes:", [p.name for p in space.planes], file=sys.stderr)
    device_planes = [
        p for p in space.planes
        if "TPU" in p.name or "/device:" in p.name.lower() or "GPU" in p.name
    ] or list(space.planes)

    for plane in device_planes:
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        by_op = defaultdict(float)   # name -> us
        by_cat = defaultdict(float)
        op_cat = {}
        n_events = 0
        for line in plane.lines:
            if args.line and args.line not in line.name:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else str(ev.metadata_id)
                dur_us = ev.duration_ps / 1e6
                by_op[name] += dur_us
                n_events += 1
                cat = None
                stats = list(ev.stats) + (list(m.stats) if m else [])
                for st in stats:
                    sm = stat_meta.get(st.metadata_id)
                    if sm and sm.name in ("hlo_category", "category", "tf_op"):
                        cat = st.str_value or None
                        if cat:
                            break
                if cat:
                    op_cat[name] = cat
        if not by_op:
            continue
        for name, us in by_op.items():
            by_cat[op_cat.get(name, "?")] += us
        total = sum(by_op.values()) or 1.0
        print(f"\n==== plane: {plane.name} "
              f"({n_events} events, {total/1e3:.2f} ms total self time) ====")
        print("== by category ==")
        for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"{us/1e3:10.2f} ms  {100*us/total:5.1f}%  {cat}")
        print(f"== top {args.top} ops ==")
        for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[: args.top]:
            cat = op_cat.get(name, "?")
            print(f"{us/1e3:10.3f} ms  {100*us/total:5.1f}%  [{cat}] {name[:100]}")


if __name__ == "__main__":
    main()
