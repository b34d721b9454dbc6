"""Per-op device-time profile of the benchmark training step.

Captures a ``jax.profiler`` trace of the scanned train step (same program as
``bench.py``) and aggregates XLA op durations from the device plane via
``jax.profiler.ProfileData`` — no TensorBoard needed. Prints the top ops and
a category rollup (gather / layout copies / fusions / convolution-matmuls /
reshape-pad / other), which is how the BASELINE.md per-op profiles were
measured.

    python tools/op_profile.py [--steps 20] [--subdiv 5] [--top 30]
    python tools/op_profile.py --sharded          # halo-exchange step
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _capture(run, args_tuple):
    """Run `run(*args_tuple)` once under a trace; return xplane path."""
    import jax

    logdir = tempfile.mkdtemp(prefix="fgc_prof_")
    with jax.profiler.trace(logdir):
        out = run(*args_tuple)
        jax.tree.map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, out)
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb written under {logdir}")
    return max(paths, key=os.path.getmtime)


def _busy_union_ns(events) -> int:
    """Total wall time covered by ≥1 event (overlaps merged)."""
    ivs = sorted((e.start_ns, e.end_ns) for e in events)
    if not ivs:
        return 0
    busy = 0
    cs, ce = ivs[0]
    for s, e in ivs[1:]:
        if s > ce:
            busy += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    return busy + (ce - cs)


def _opcode(name: str) -> str:
    m = re.match(r"%?([a-zA-Z-]+)", name.lstrip("%"))
    return m.group(1) if m else name[:24]


def _shape_sig(name: str) -> str:
    """Group by `<shape> <opcode>` so layout variants of the same tensor
    aggregate together."""
    m = re.search(r"= (\S+) ([a-zA-Z-]+)\(", name)
    return f"{m.group(1)} {m.group(2)}" if m else name[:90]


def summarize(xplane_path: str, steps: int, top: int):
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane_path)
    device_planes = [p for p in data.planes
                     if p.name.startswith("/device:") and "CUSTOM" not in p.name]
    for plane in device_planes:
        print(f"== plane {plane.name}")
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            events = list(line.events)
            busy = _busy_union_ns(events)
            per = collections.Counter()
            cnt = collections.Counter()
            sig = collections.Counter()
            for ev in events:
                op = _opcode(ev.name)
                if op in ("while", "jit"):     # outer scan wrapper — skip
                    continue
                per[op] += ev.duration_ns
                cnt[op] += 1
                sig[_shape_sig(ev.name)] += ev.duration_ns
            print(f"-- line '{line.name}': busy {busy/1e6/steps:.3f} ms/step, "
                  f"op-sum {sum(per.values())/1e6/steps:.3f} ms/step")
            for op, ns in per.most_common(12):
                print(f"   {ns/1e6/steps:8.3f} ms/step x{cnt[op]//steps:<5d} {op}")
            print(f"   top {top} by shape signature:")
            for s, ns in sig.most_common(top):
                print(f"   {ns/1e6/steps:8.3f} ms/step  {s[:100]}")
            print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--subdiv", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--dp", action="store_true",
                    help="profile the data-parallel scanned step")
    ap.add_argument("--vertex", action="store_true",
                    help="profile the end-to-end vertex training step "
                         "(chamfer through the 120-iteration solver)")
    args = ap.parse_args()

    if args.vertex:
        import bench

        run, args_t, info = bench.build_vertex_runner(
            steps=args.steps, subdiv=min(args.subdiv, 4))
        xp = _capture(run, args_t)
        print(f"xplane: {xp}  ({info['nodes']} nodes, "
              f"{info['vertices']} vertices)\n")
        summarize(xp, args.steps, args.top)
        return

    if args.dp:
        import bench

        run, args_t, mesh, _ = bench.build_dp_runner(steps=args.steps,
                                                     subdiv=args.subdiv)
        with mesh:
            xp = _capture(run, args_t)
        print(f"xplane: {xp}\n")
        summarize(xp, args.steps, args.top)
        return

    if args.sharded:
        import bench as b
        res = b.measure_sharded(steps=args.steps, subdiv=args.subdiv,
                                repeats=1)
        print(f"(sharded step {res['median_step_s']*1e3:.2f} ms; trace via "
              f"plain path not wired — use bench.py --sharded for timing)")
        return

    import bench

    # the exact program bench.py times (shared builder — no drift)
    run, args_t, _ = bench.build_step_runner(steps=args.steps,
                                             subdiv=args.subdiv)
    xp = _capture(run, args_t)
    print(f"xplane: {xp}\n")
    summarize(xp, args.steps, args.top)


if __name__ == "__main__":
    main()
