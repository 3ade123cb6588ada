"""Benchmark: query-video pairs scored per second per chip (north star).

Measures the flagship Charades-STA-scale SMIN (T=64, L=16, C=4, D=512,
3 SMI layers, bf16, packed layout) on one chip:

* **serving** (primary metric): forward + packed proposal scores
  pm*sqrt(ps)*sqrt(pe) + top-k — the work the reference does per eval batch
  (reference models.py forward + utils.py:10-31) — at serving batch B=6144.
  Two timings are reported:
  - ``value``/on-chip: K scored batches chained *inside one jit* via
    lax.scan (each iteration's input depends on the previous counts, so
    nothing is CSE'd or overlapped) — pure device throughput, no transport;
  - ``wall_pairs_per_sec``: one call per batch with a host fetch each
    iteration — includes the remote-transport round trip, i.e. what a
    single synchronous client would observe.
* **training**: the fused train step (fwd+bwd+Adam+metrics) at B=256,
  K steps chained in one jit through the params/opt-state carry.
* **MFU**: measured matmul-FLOP rate (utils/flops.py, analytic) over the
  chip's peak — the roofline context VERDICT r1 asked for.

Structure (round-3 VERDICT item 1 — the bench must emit a number
unconditionally, within the driver budget):

1. phase A measures the packed **XLA** serving path first (compiles in
   seconds) plus the train chain and a soft-NMS-on serving variant —
   after this a complete JSON line is guaranteed;
2. phase B attempts the **fused SMI-stack kernel** upgrade in a
   subprocess under an explicit timeout (``VML_BENCH_FUSED_TIMEOUT``,
   default = remaining budget); its number replaces the serving value
   only if the subprocess finishes and is faster;
3. a SIGTERM/SIGINT handler prints the best-so-far JSON, so even an
   external `timeout` kill records phase A's numbers.

Scope note (recorded in the JSON too): weights are randomly initialized
and inputs synthetic — this measures compute throughput, not accuracy;
the primary serving number is NMS-off (the reference has no NMS,
utils.py:14); `serving_nms_pairs_per_sec` prices in soft-NMS top-k.

Baseline: the PyTorch reference measured in this environment on CPU
(1 vCPU, torch 2.x single thread): 9.94 pairs/s at the same model shapes
with batch 64 (forward + compute_ious, eval mode). The CPU reference is
compute-bound and gains nothing from larger batches; the TPU number uses
a serving-style batch to fill the chip.

Prints exactly one JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np

# Persistent compilation cache: phase B's fused-kernel compile is the slow
# part (minutes cold); cache hits make re-runs (e.g. the driver's
# end-of-round bench after an in-round pre-warm) near-instant.
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

BASELINE_PAIRS_PER_SEC = 9.94  # PyTorch-CPU reference, measured (see docstring)

# Serving batch 6144 fills HBM to ~80% (8192 OOMs at 17.3/15.75 GB) and
# gains ~6% over 4096; train batch 512 measured +36% over 256 on the
# fused train path (more grid cells per step amortize the kernel
# pipeline; recorded in the JSON as train_batch).
B_SERVE = int(os.environ.get("VML_BENCH_B_SERVE", 6144))
B_TRAIN = int(os.environ.get("VML_BENCH_B_TRAIN", 512))
K_CHAIN = int(os.environ.get("VML_BENCH_K", 8))  # scan iters inside one jit
# The train chain scans the WHOLE train step (fwd+bwd+Adam) K times inside
# one jit; the remote AOT compile time scales with the scanned body, so
# the train chain uses a smaller K (timing precision is unaffected: one
# chain still runs ~0.2 s on chip).
K_TRAIN = int(os.environ.get("VML_BENCH_K_TRAIN", 4))
WALL_ITERS = 8
# Wall-clock ceiling for the whole bench; phase B gets what is left.
# One remote AOT compile of a B=6144 program costs ~5-6 min in this
# environment and the compile cache does not hit across tunnel sessions,
# so the ceiling covers phase A's serving compile plus the fused probe's
# 4 programs (~13-17 min total when the two processes contend for the one
# host core). The round-2 driver's capture allowed >27 min before
# killing; a SIGTERM handler emits the best-so-far JSON if the ceiling is
# ever exceeded anyway.
BUDGET_S = float(os.environ.get("VML_BENCH_BUDGET", 1500))
_T0 = time.perf_counter()

# Peak matmul throughput for MFU context. TPU v5e: ~197 TFLOP/s bf16.
# Override with VML_PEAK_FLOPS for other chips.
PEAK_FLOPS = float(os.environ.get("VML_PEAK_FLOPS", 197e12))

_RESULT: dict | None = None  # best-so-far, printed by the signal handler
_PROBE_PROC = None           # fused-probe subprocess, killed on SIGTERM


def _emit_and_exit(signum=None, frame=None):
    if _PROBE_PROC is not None and _PROBE_PROC.poll() is None:
        try:
            _PROBE_PROC.kill()
        except Exception:
            pass
    if _RESULT is not None:
        print(json.dumps(_RESULT), flush=True)
    os._exit(0 if _RESULT is not None else 1)


def _progress(msg: str) -> None:
    """Timestamped progress line on stderr (stdout carries only the JSON)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _timed_fetch(fn, *args):
    """Best-of-3 wall time of fn(*args) with a host fetch (real completion)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def _setup(cfg):
    from __graft_entry__ import _synthetic_arrays
    from video_moment_localization_tpu.models import init_smin_params

    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    vf, vm, qf, qm, lm, mm = _synthetic_arrays(cfg, B=B_SERVE)
    N = cfg.L * (cfg.L + 1) // 2
    sm_shape = (B_SERVE, N) if cfg.packed else (B_SERVE, cfg.L, cfg.L)
    sm = jax.numpy.asarray(rng.uniform(0, 1, sm_shape).astype(np.float32))
    return params, (vf, vm, qf, qm, lm, mm), sm


def _make_score_chain(cfg, use_nms: bool = False):
    from video_moment_localization_tpu.models.smin import smin_forward_inference
    from video_moment_localization_tpu.train.metrics import (
        recall_counts,
        recall_counts_packed,
    )

    def score_batch(params, vf, vm, qf, qm, lm, mm, sm):
        pm, ps, pe, _ = smin_forward_inference(params, cfg, vf, vm, qf, qm,
                                               lm, mm)
        if cfg.packed:
            return recall_counts_packed(pm, ps, pe, lm, sm, use_nms=use_nms)
        return recall_counts(pm, ps, pe, mm, sm, use_nms=use_nms)

    @jax.jit
    def score_chain(params, vf, vm, qf, qm, lm, mm, sm):
        # Serial dependency: each iteration perturbs vf by a value derived
        # from the previous counts (numerically negligible, structurally
        # un-CSE-able), so K full forwards execute back to back on device.
        def body(c, _):
            counts = score_batch(params, vf + c, vm, qf, qm, lm, mm, sm)
            return counts.sum() * 1e-30, counts

        _, counts = jax.lax.scan(body, jax.numpy.float32(0.0), None,
                                 length=K_CHAIN)
        return counts[-1]

    return jax.jit(score_batch), score_chain


def _measure_serving(cfg, params, arrays, sm, wall: bool = True):
    score_jit, score_chain = _make_score_chain(cfg)
    args = (params, *arrays, sm)
    np.asarray(score_chain(*args))  # compile + first run
    chain_dt = _timed_fetch(score_chain, *args)
    onchip = K_CHAIN * B_SERVE / chain_dt

    wall_pairs = None
    if wall:
        np.asarray(score_jit(*args))
        best_wall = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(WALL_ITERS):
                np.asarray(score_jit(*args))
            best_wall = min(best_wall, time.perf_counter() - t0)
        wall_pairs = WALL_ITERS * B_SERVE / best_wall
    return onchip, wall_pairs, chain_dt


def _make_train_chain(cfg, params):
    """Build the K_TRAIN-chained train-step program + its args."""
    import optax

    from __graft_entry__ import _synthetic_arrays
    from video_moment_localization_tpu.models import smin_forward
    from video_moment_localization_tpu.train.loss import smin_loss

    N = cfg.L * (cfg.L + 1) // 2
    rng = np.random.default_rng(1)
    tvf, tvm, tqf, tqm, tlm, tmm = _synthetic_arrays(cfg, B=B_TRAIN)
    tsm = rng.uniform(0, 1, (B_TRAIN, N)).astype(np.float32)
    batch = {
        "video_features": tvf, "video_mask": tvm, "query_features": tqf,
        "query_mask": tqm, "length_mask": tlm,
        "sm": jax.numpy.asarray(tsm),
        "ym": jax.numpy.asarray((tsm > 0.5).astype(np.float32)),
    }
    for k in ("ss", "ys", "se", "ye", "ya"):
        v = rng.uniform(0, 1, (B_TRAIN, cfg.L)).astype(np.float32)
        batch[k] = jax.numpy.asarray(
            v if k in ("ss", "se") else (v > 0.5).astype(np.float32))
    batch["sample_mask"] = jax.numpy.ones(B_TRAIN, np.float32)

    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    def one_step(p, o):
        def loss_fn(p_):
            out = smin_forward(p_, cfg, tvf, tvm, tqf, tqm, tlm, None)
            loss, _ = smin_loss(out, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def train_chain(p, o):
        def body(carry, _):
            p_, o_ = carry
            p_, o_, loss = one_step(p_, o_)
            return (p_, o_), loss

        (p, o), losses = jax.lax.scan(body, (p, o), None, length=K_TRAIN)
        return losses[-1]

    return train_chain, (params, opt_state)


def _measure_train(cfg, params):
    """K_TRAIN-chained train-step device throughput (samples/s) at B_TRAIN."""
    train_chain, targs = _make_train_chain(cfg, params)
    np.asarray(train_chain(*targs))  # compile
    train_dt = _timed_fetch(train_chain, *targs)
    return K_TRAIN * B_TRAIN / train_dt, train_dt


def _fused_probe() -> None:
    """Subprocess mode: measure the fused-kernel serving AND training paths.

    The slow Mosaic/AOT compiles happen here, OVERLAPPED with the parent's
    phase-A compiles (launched together; remote compiles don't occupy the
    chip). TIMING is serialized against the parent through a gate file
    (``VML_PROBE_GATE``): the probe compiles everything first, then waits
    for the parent to finish its own timings before timing. One JSON line
    is printed per completed measurement so partial results survive a
    mid-probe timeout (the parent takes the last line)."""
    from __graft_entry__ import _charades_cfg

    cfg = _charades_cfg()  # fused_smi/fused_smi_train=True defaults
    params, arrays, sm = _setup(cfg)
    out = {"phase": "fused"}

    # ---- compile everything (runs each program once) ----
    _progress("probe: compiling fused serving chain")
    _, score_chain = _make_score_chain(cfg)
    args = (params, *arrays, sm)
    np.asarray(score_chain(*args))
    _progress("probe: compiling fused train chain")
    train_fn, train_args = _make_train_chain(cfg, params)
    train_compiled = True
    try:
        np.asarray(train_fn(*train_args))
    except Exception:
        train_compiled = False
    _progress(f"probe: compiles done (train_compiled={train_compiled})")
    print(json.dumps({"phase": "fused", "compiled": True}), flush=True)

    # ---- wait for the parent to release the chip for timing ----
    gate = os.environ.get("VML_PROBE_GATE")
    if gate:
        deadline = time.time() + 600
        while not os.path.exists(gate) and time.time() < deadline:
            time.sleep(1.0)

    chain_dt = _timed_fetch(score_chain, *args)
    out.update({"onchip_pairs": K_CHAIN * B_SERVE / chain_dt,
                "chain_dt": chain_dt})
    print(json.dumps(out), flush=True)
    if train_compiled:
        train_dt = _timed_fetch(train_fn, *train_args)
        out.update({"train_sps": K_TRAIN * B_TRAIN / train_dt,
                    "train_dt": train_dt})
        print(json.dumps(out), flush=True)
    # No per-call wall measurement here: its extra score_batch compile
    # would keep the subprocess alive minutes past the useful lines and
    # trip the parent's timeout. (Measured separately: 46.7k pairs/s wall
    # for the fused path at B=6144.)


def main() -> None:
    global _RESULT
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.utils.flops import (
        smin_forward_flops,
        smin_train_step_flops,
    )

    cfg = _charades_cfg()
    xla_cfg = dataclasses.replace(cfg, fused_smi=False, fused_smi_train=False)
    on_tpu = jax.default_backend().startswith(("tpu", "axon"))

    # ---------------- phase A: XLA serving path ----------- #
    # Every large program costs ~5-6 min of remote AOT compile on a good
    # day (occasionally much worse — the compile server is shared) and
    # the persistent cache does NOT hit across processes here (the tunnel
    # session salts the key). The bench therefore runs strictly
    # value-ordered with progress stamps on stderr, and the fused-kernel
    # work happens in a killable subprocess with a guaranteed minimum
    # window. An earlier design overlapped the probe's compiles with
    # phase A's; the two processes' HLO lowering and remote compiles
    # contend (1 host core, shared compile helper) and the worst case
    # got WORSE — sequential is the stable shape.
    _progress("phase A: compiling + timing the XLA serving chain")
    params, arrays, sm = _setup(xla_cfg)
    onchip_pairs, wall_pairs, chain_dt = _measure_serving(
        xla_cfg, params, arrays, sm, wall=False)
    _progress(f"phase A done: {onchip_pairs:.0f} pairs/s (XLA)")
    serve_flops = smin_forward_flops(cfg, B_SERVE)
    serving_mfu = serve_flops * K_CHAIN / chain_dt / PEAK_FLOPS

    note = ("on-chip value from a K={k} in-jit chained scan (no transport); "
            "wall_pairs_per_sec includes per-call transport RTT; random "
            "weights + synthetic inputs (throughput only, not accuracy); "
            "primary serving number is NMS-OFF like the reference "
            "(utils.py:14), serving_nms_pairs_per_sec adds soft-NMS; "
            "baseline torch-CPU uses batch 64 (compute-bound, "
            "batch-insensitive) vs serving batch {bs} here; MFU vs "
            "{pk:.0f} TFLOP/s peak (bf16)").format(
                k=K_CHAIN, bs=B_SERVE, pk=PEAK_FLOPS / 1e12)

    _RESULT = {
        "metric": "query_video_pairs_scored_per_sec_per_chip",
        "value": round(onchip_pairs, 2),
        "unit": "pairs/s",
        "vs_baseline": round(onchip_pairs / BASELINE_PAIRS_PER_SEC, 2),
        "serving_mfu_pct": round(100 * serving_mfu, 2) if on_tpu else None,
        "serving_batch": B_SERVE,
        "train_batch": B_TRAIN,
        "serving_path": "xla",
        "note": note,
    }

    # ---------------- phase B: join the fused probe (budgeted) ----------- #
    # The XLA train chain is NOT measured up front: with a 1-core host the
    # two processes' HLO lowering serializes, so every parent compile
    # delays the probe 1:1. The probe carries the train number on success;
    # the XLA train chain is the fallback (measured below only if needed).
    train_flops = smin_train_step_flops(cfg, B_TRAIN)
    train_sps = 0.0

    def _remaining():
        return BUDGET_S - (time.perf_counter() - _T0) - 20

    if on_tpu and float(os.environ.get("VML_BENCH_FUSED_TIMEOUT", 1)) > 0:
        global _PROBE_PROC
        try:
            # The probe always gets a useful minimum window even if phase A
            # overran the nominal budget: the driver's kill arrives well
            # after BUDGET_S, and the SIGTERM handler emits phase A's
            # numbers if the worst case ever lands.
            probe_timeout = float(os.environ.get(
                "VML_BENCH_FUSED_TIMEOUT", max(_remaining(), 480)))
            _progress(f"phase B: fused probe subprocess "
                      f"(timeout {probe_timeout:.0f}s)")
            probe_proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--fused-probe"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            _PROBE_PROC = probe_proc
            try:
                stdout, _ = probe_proc.communicate(timeout=probe_timeout)
            except subprocess.TimeoutExpired:
                # The probe prints one JSON line per completed stage —
                # kill it and salvage whatever finished.
                probe_proc.kill()
                stdout, _ = probe_proc.communicate()
                _RESULT["serving_path"] = "xla (fused probe timed out)"
            stdout = stdout or ""
            line = next((ln for ln in reversed(stdout.splitlines())
                         if ln.startswith("{") and "compiled" not in ln),
                        None)
            if line:
                probe = json.loads(line)
                if probe.get("onchip_pairs", 0) > onchip_pairs:
                    _RESULT.update({
                        "value": round(probe["onchip_pairs"], 2),
                        "vs_baseline": round(
                            probe["onchip_pairs"] / BASELINE_PAIRS_PER_SEC, 2),
                        "serving_mfu_pct": round(
                            100 * serve_flops * K_CHAIN / probe["chain_dt"]
                            / PEAK_FLOPS, 2),
                        "serving_path": "fused_smi_stack",
                        "serving_xla_pairs_per_sec": round(onchip_pairs, 2),
                    })
                    if probe.get("wall_pairs"):
                        _RESULT["wall_pairs_per_sec"] = round(
                            probe["wall_pairs"], 2)
                if probe.get("train_sps", 0) > 0:
                    _RESULT.update({
                        "train_samples_per_sec_per_chip": round(
                            probe["train_sps"], 2),
                        "train_path": "fused_smi_train",
                        "train_mfu_pct": round(
                            100 * train_flops * K_TRAIN / probe["train_dt"]
                            / PEAK_FLOPS, 2),
                    })
        except Exception:
            _RESULT["serving_path"] = "xla (fused probe failed)"
        finally:
            if _PROBE_PROC is not None and _PROBE_PROC.poll() is None:
                _PROBE_PROC.kill()
        _progress(f"phase B done: serving_path={_RESULT['serving_path']}")

    # ------- fallback: XLA train chain if the probe brought no train ----- #
    if "train_samples_per_sec_per_chip" not in _RESULT:
        if _remaining() >= 240 or not on_tpu:
            train_sps, train_dt = _measure_train(xla_cfg, params)
            _RESULT["train_samples_per_sec_per_chip"] = round(train_sps, 2)
            _RESULT["train_path"] = "xla"
            _RESULT["train_mfu_pct"] = (
                round(100 * train_flops * K_TRAIN / train_dt / PEAK_FLOPS, 2)
                if on_tpu else None)
        else:
            _RESULT["train_samples_per_sec_per_chip"] = None
            _RESULT["train_path"] = "none (no budget left)"

    # -------- extras, cheapest-first, each gated on leftover budget ------ #
    # Per-call wall throughput (adds one B_SERVE forward compile).
    if "wall_pairs_per_sec" not in _RESULT and _remaining() >= 120:
        try:
            score_jit, _ = _make_score_chain(xla_cfg)
            args = (params, *arrays, sm)
            np.asarray(score_jit(*args))
            best_wall = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(WALL_ITERS):
                    np.asarray(score_jit(*args))
                best_wall = min(best_wall, time.perf_counter() - t0)
            _RESULT["wall_pairs_per_sec"] = round(
                WALL_ITERS * B_SERVE / best_wall, 2)
        except Exception:
            pass

    # Soft-NMS serving variant (BASELINE config #4).
    if _remaining() >= 150:
        try:
            _, nms_chain = _make_score_chain(xla_cfg, use_nms=True)
            args = (params, *arrays, sm)
            np.asarray(nms_chain(*args))
            nms_dt = _timed_fetch(nms_chain, *args)
            _RESULT["serving_nms_pairs_per_sec"] = round(
                K_CHAIN * B_SERVE / nms_dt, 2)
        except Exception:
            _RESULT["serving_nms_pairs_per_sec"] = None
    else:
        _RESULT["serving_nms_pairs_per_sec"] = None

    print(json.dumps(_RESULT))


if __name__ == "__main__":
    if "--fused-probe" in sys.argv:
        _fused_probe()
    else:
        main()
