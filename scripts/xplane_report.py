"""Summarise a jax.profiler xplane capture: device-time per HLO op.

Parses the raw .xplane.pb with TensorFlow's bundled xplane proto (the
tensorboard_plugin_profile wheel in this image is incompatible with TF 2.21)
and prints, per trace line, total duration and the top ops by accumulated
self time. This is the evidence layer for bench.py's MFU figure.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/xplane_report.py /tmp/phiseg_profile_train [top_n]
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def load_xspace(root: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{root}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {root}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


GROUPS = [
    ("conv fwd/bwd (fusion w/ convolution)", r"convolution|conv"),
    ("matmul/dot", r"dot|gemm"),
    ("all-reduce/collective", r"all-reduce|all-gather|reduce-scatter|collective"),
    ("copy/transpose/layout", r"copy|transpose|bitcast|reshape"),
    ("reduce (BN stats etc.)", r"reduce"),
    ("dynamic slice/update/gather/scatter", r"slice|gather|scatter|pad"),
    ("rng", r"rng|random"),
]


def classify(name: str) -> str:
    low = name.lower()
    for label, pat in GROUPS:
        if re.search(pat, low):
            return label
    return "other (elementwise fusions etc.)"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/phiseg_profile_train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    xs = load_xspace(root)

    for plane in xs.planes:
        if "TPU" not in plane.name and "CPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            per_op = collections.Counter()
            total_ps = 0
            n_events = 0
            t_min, t_max = None, None
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                total_ps += ev.duration_ps
                n_events += 1
                t0 = ev.offset_ps
                t1 = ev.offset_ps + ev.duration_ps
                t_min = t0 if t_min is None else min(t_min, t0)
                t_max = t1 if t_max is None else max(t_max, t1)
            if n_events == 0:
                continue
            # guard: a line of only zero-duration events has t_max == t_min
            span_ms = max((t_max - t_min) / 1e9, 1e-9)
            busy_ms = total_ps / 1e9
            print(f"\n== {plane.name} :: {line.name} | events={n_events} "
                  f"busy={busy_ms:.2f} ms span={span_ms:.2f} ms "
                  f"(occupancy {100 * busy_ms / span_ms:.0f}%)")
            if "step" in line.name.lower() or n_events < 50:
                continue
            groups = collections.Counter()
            for name, ps in per_op.items():
                groups[classify(name)] += ps
            print("  -- by category --")
            for g, ps in groups.most_common():
                print(f"  {ps / 1e9:9.2f} ms  {100 * ps / total_ps:5.1f}%  {g}")
            print("  -- top ops --")
            for name, ps in per_op.most_common(top_n):
                print(f"  {ps / 1e9:9.2f} ms  {100 * ps / total_ps:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
