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
    # ordered: first match wins. convert_reduce (BN stat fusions) MUST come
    # before conv -- "conVert" contains "conv" and used to inflate the conv
    # bucket (the round-2 report's 21.5% conv figure had ~3 ms/step of BN
    # stats folded in).
    ("batch-stat convert+reduce (BN)", r"convert_reduce|reduce_fusion"),
    ("conv fwd/bwd", r"convolution"),
    ("conv bwd-filter grads (3x3 kernel-shaped fusion)",
     r"= \(?(f32|bf16)\[3,3,"),
    ("matmul/dot", r"\bdot\b|gemm"),
    ("all-reduce/collective", r"all-reduce|all-gather|reduce-scatter|collective"),
    ("copy/transpose/layout", r"copy|transpose|bitcast|reshape"),
    ("reduce", r"reduce"),
    ("dynamic slice/update/gather/scatter", r"slice|gather|scatter|pad"),
    ("rng", r"rng|random"),
]

_SHAPE = re.compile(r"(?:f32|bf16|s32|u32|pred|s8|u8)\[([\d,]*)\]\{([\d,]*)")


def classify(name: str) -> str:
    low = name.lower()
    for label, pat in GROUPS:
        if re.search(pat, low):
            return label
    # relayout fusions carry no telling op name: same dims appear with two
    # different minor-to-major layouts (e.g. bf16[12,128,128,128]{3,2,1,0}
    # -> {3,0,2,1}); XLA:TPU materialises these around conv fwd/bwd.
    shapes = _SHAPE.findall(low)
    layouts_by_dims = collections.defaultdict(set)
    for dims, layout in shapes:
        layouts_by_dims[dims].add(layout)
    if any(len(v) > 1 for v in layouts_by_dims.values()):
        return "copy/transpose/layout"
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
