"""Aggregate device-op times from a jax.profiler trace.

Usage:
    python tools/profile_tpu.py <trace_dir>          # parse existing trace
    (capture one with `cli.py --profile DIR` or jax.profiler.trace)

Prints per-op total/self duration on the TPU plane, sorted descending —
the ground-truth breakdown the wall clock can't give through the axon
tunnel (block_until_ready acks at enqueue; see bench.py).
"""
from __future__ import annotations

import collections
import glob
import sys


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    )
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_times(xs, plane_substr: str = "TPU"):
    """{op_name: (total_ps, count)} from the device plane's XLA Ops line."""
    out = collections.defaultdict(lambda: [0, 0])
    for plane in xs.planes:
        if plane_substr not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                out[name][0] += ev.duration_ps
                out[name][1] += 1
    return {k: (v[0], v[1]) for k, v in out.items()}


def main():
    trace_dir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = load_xspace(trace_dir)
    times = device_op_times(xs)
    total = sum(t for t, _ in times.values())
    print(f"{'op':60s} {'ms':>10s} {'count':>8s} {'%':>6s}")
    for name, (ps, n) in sorted(
        times.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        print(
            f"{name[:60]:60s} {ps / 1e9:10.3f} {n:8d} "
            f"{100 * ps / max(total, 1):6.1f}"
        )
    print(f"{'TOTAL':60s} {total / 1e9:10.3f}")


if __name__ == "__main__":
    main()
