"""On-chip jax.profiler trace of the fused train step + xplane attribution.

VERDICT r3 item 5: the 25.1% train MFU vs 40.5% serving MFU gap was argued
from probe elimination; this captures actual timeline data. Runs the bench
train chain (Charades dims, B=1024 default, bf16, fused kernels) under
`jax.profiler.trace`, then parses the resulting .xplane.pb with
tensorboard_plugin_profile's raw-to-tool converters and prints:

* per-XLA-op device wall (the two Pallas train kernels show up as single
  custom-call ops — `smin_layer_fwd` / `smin_layer_bwd` etc.), and
* the per-category rollup + step gaps,

which is exactly the granularity needed to attribute the gap: fwd-kernel
vs bwd-kernel vs XLA segments (backbone/LSTM/proposal/Adam) vs idle.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py \
      [--batch 1024] [--k 8] [--steps 2] [--dtype bfloat16] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _trace_events(logdir: str):
    """Yield (name, dur_us, pid_name) device events from the trace_viewer
    JSON. jax.profiler writes a ready-made *.trace.json.gz next to the
    xplane; prefer it (the tensorboard_plugin_profile converter trips over
    a protobuf version skew in this image)."""
    jsons = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if jsons:
        import gzip

        with gzip.open(jsons[0], "rt") as f:
            trace = json.load(f)
    else:
        os.environ.setdefault(
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                            recursive=True)
        if not xplanes:
            raise FileNotFoundError(f"no trace under {logdir}")
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "trace_viewer", {})
        trace = json.loads(data)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"]["name"]
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            yield (ev.get("name", "?"), float(ev["dur"]),
                   pid_names.get(ev.get("pid"), "?"), ev.get("ts", 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--logdir", default="/tmp/vml_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--analyze-only", action="store_true",
                    help="skip the run; parse an existing --logdir")
    args = ap.parse_args()

    if not args.analyze_only:
        os.environ["VML_BENCH_B_TRAIN"] = str(args.batch)
        os.environ["VML_BENCH_K_TRAIN"] = str(args.k)
        import dataclasses

        import jax

        from __graft_entry__ import _charades_cfg
        import bench
        from video_moment_localization_tpu.models import init_smin_params

        cfg = dataclasses.replace(_charades_cfg(), compute_dtype=args.dtype)
        params = init_smin_params(jax.random.PRNGKey(0), cfg)
        if args.dtype == "bfloat16":
            import jax.numpy as jnp

            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        chain, targs = bench._make_train_chain(cfg, params)
        print("compiling + warming...", flush=True)
        np.asarray(chain(*targs))  # compile + warm
        np.asarray(chain(*targs))
        print("tracing...", flush=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.steps):
                np.asarray(chain(*targs))

    # ---- attribution ---------------------------------------------------- #
    per_op: dict = {}
    device_total = 0.0
    spans = []
    for name, dur, pid, ts in _trace_events(args.logdir):
        if "TPU" not in pid and "/device" not in pid.lower():
            continue
        rec = per_op.setdefault(name, [0.0, 0])
        rec[0] += dur
        rec[1] += 1
        device_total += dur
        spans.append((ts, ts + dur))

    # Busy (union of spans) vs span (first-start to last-end) => idle gaps.
    spans.sort()
    busy = 0.0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    wall = (spans[-1][1] - spans[0][0]) if spans else 0.0

    print(f"\ndevice busy {busy / 1e3:.2f} ms / span {wall / 1e3:.2f} ms "
          f"({100 * busy / max(wall, 1e-9):.1f}% occupancy; "
          f"{len(per_op)} distinct ops)")
    print(f"\n top ops by total device time:")
    items = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    for name, (tot, cnt) in items[:args.top]:
        print(f"  {tot / 1e3:9.3f} ms  x{cnt:<5d} {name[:110]}")
    kept = sum(t for _, (t, _) in items[:args.top])
    print(f"  {(device_total - kept) / 1e3:9.3f} ms  (rest)")

    # Category rollup. Naming facts from the HLO: the Pallas train kernels
    # surface as custom-calls named jvp__.N (fwd) / transpose_jvp___.N (bwd);
    # the bi-LSTM is the lax.scan while loops (excluding the outermost chain
    # while, which contains everything). Skip container ops to avoid
    # double-counting.
    whiles = sorted(((n, t, c) for n, (t, c) in per_op.items()
                     if n.startswith("while")), key=lambda x: -x[1])
    container = {whiles[0][0]} if whiles else set()
    container |= {n for n in per_op
                  if n.startswith("jit_") or n.isdigit()
                  or n.endswith("(root)")}
    cats = {"fused fwd (jvp custom-calls)": 0.0,
            "fused bwd (transpose_jvp custom-calls)": 0.0,
            "lstm scans (while bodies)": 0.0,
            "xla rest (fusions/adam/copies)": 0.0}
    leaf_total = 0.0
    for name, (tot, cnt) in per_op.items():
        if name in container:
            continue
        leaf_total += tot
        if name.startswith("jvp_"):
            cats["fused fwd (jvp custom-calls)"] += tot
        elif name.startswith("transpose_jvp"):
            cats["fused bwd (transpose_jvp custom-calls)"] += tot
        elif name.startswith("while"):
            cats["lstm scans (while bodies)"] += tot
        else:
            cats["xla rest (fusions/adam/copies)"] += tot
    print("\n category rollup (leaf ops only):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v / 1e3:9.3f} ms  {100 * v / max(leaf_total, 1e-9):5.1f}%"
              f"  {k}")
    print(f"  {leaf_total / 1e3:9.3f} ms  total leaf device time")


if __name__ == "__main__":
    main()
