"""Benchmark: query-video pairs scored per second per chip (north star).

Measures the flagship Charades-STA-scale SMIN (T=64, L=16, C=4, D=512,
3 SMI layers, bf16, packed layout) on one chip:

* **serving** (primary metric): forward + packed proposal scores
  pm*sqrt(ps)*sqrt(pe) + top-k — the work the reference does per eval batch
  (reference models.py forward + utils.py:10-31) — at serving batch B=6144.
  The ``value`` is on-chip: K scored batches chained *inside one jit* via
  lax.scan (each iteration's input depends on the previous counts, so
  nothing is CSE'd or overlapped) — pure device throughput, no transport.
* **training**: the fused train step (fwd+bwd+Adam+metrics) at B=512,
  K steps chained in one jit through the params/opt-state carry.
* **MFU**: measured matmul-FLOP rate (utils/flops.py, analytic) over the
  chip's peak — the roofline context VERDICT r1 asked for.

Structure (VERDICT r2 item 1 — the bench must emit a number
unconditionally, within the driver budget). Hard-won environment facts
shape it (docs/ARCHITECTURE.md "axon quirks"): the host has ONE cpu core;
every remote AOT compile costs minutes and the persistent compile cache
never hits across processes (the tunnel session salts the key); a
host->device transfer of the B=6144 input set costs ~10 minutes of
syscall-bound tunnel I/O — so all synthetic inputs are generated ON
DEVICE (one small jitted jax.random program) and never cross the wire.

1. The parent process is a thin JAX-free coordinator. It immediately
   spawns the **fused-path probe** subprocess, which compiles and times,
   in value order, the fused serving chain, the fused train chain, and a
   soft-NMS serving variant — printing one JSON line per completed
   measurement so partial results survive a kill.
2. The parent streams the probe's stdout under per-stage deadlines
   (serving by ~55% of budget, the rest by ~85%). Whatever lines arrived
   become the result.
3. Only if the probe produced no serving number does the parent import
   JAX and run the packed-XLA serving path itself (compiles in ~5 min);
   with very little budget left it drops to a smaller-batch XLA measure.
4. A SIGTERM/SIGINT handler prints the best-so-far JSON, so an external
   `timeout` kill still records every completed stage.

Scope note (recorded in the JSON too): weights are randomly initialized
and inputs synthetic — this measures compute throughput, not accuracy;
the primary serving number is NMS-off (the reference has no NMS,
utils.py:14); `serving_nms_pairs_per_sec` prices in soft-NMS top-k.

Baseline: the PyTorch reference measured in this environment on CPU
(1 vCPU, torch 2.x single thread): 9.94 pairs/s at the same model shapes
with batch 64 (forward + compute_ious, eval mode). The CPU reference is
compute-bound and gains nothing from larger batches; the TPU number uses
a serving-style batch to fill the chip.

Prints exactly one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_PAIRS_PER_SEC = 9.94  # PyTorch-CPU reference, measured (see docstring)

# Serving batch 6144 fills HBM to ~80% (8192 OOMs at 17.3/15.75 GB) and
# gains ~6% over 4096. Train batch 1024: +6.5% over 512 on the chained
# step (10,698 vs 10,044 samples/s) — unlocked by passing the batch as a
# jit ARGUMENT in _make_train_chain (closure-captured device arrays are
# embedded in the MLIR as hex literals: 292 of 293 MB at B=512, and the
# B=1024 program hit the remote compile service's request-size limit).
# The fix also cut the train-chain compile from ~330 s to ~40-74 s.
# B=2048 measured SLOWER (11,375 vs ~12,000 samples/s at B=1024): the
# kernels' grid already saturates the chip at 1024; bigger batches only
# add HBM pressure. Re-measured after the c-major rows proposal
# interface (which deleted the transpose glue that might have favored
# bigger batches): 14,275 at B=2048 vs 14,211 at B=1024 — neutral
# (+0.5%, noise), B=1024 stands.
B_SERVE = int(os.environ.get("VML_BENCH_B_SERVE", 6144))
# Train batch 1536 (round 4): divisible by 6, which admits the BB=6
# backward cell under the widened bwd VMEM window — measured 16.4k vs
# 15.1k samples/s at B=1024/BB=4 (+8.2%); batch size itself is neutral
# (B=2048 at BB=4 measured +0.5% vs 1024). Costs ~2 min of extra cold
# Mosaic compile on the train chain (~7 vs ~5 min).
B_TRAIN = int(os.environ.get("VML_BENCH_B_TRAIN", 1536))
# K = scan iters inside one jit. Each dispatched call through the tunnel
# costs ~27 ms host-side regardless of device work, so per-step overhead
# is ~27/K ms: at the old K_TRAIN=4 that shaved ~6.8 ms/step off the
# reported train number (10.7k reported vs 12.0k on-chip at K=16 —
# scripts/bench_train_breakdown.py). K only sets the scan trip count
# (the body compiles once), so longer chains cost compile nothing.
K_CHAIN = int(os.environ.get("VML_BENCH_K", 16))
K_TRAIN = int(os.environ.get("VML_BENCH_K_TRAIN", 16))
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
    if _RESULT is not None and _RESULT.get("value"):
        print(json.dumps(_RESULT), flush=True)
        os._exit(0)
    os._exit(1)


def _progress(msg: str) -> None:
    """Timestamped progress line on stderr (stdout carries only the JSON)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


# ------------------------------------------------------------------ #
# measurement helpers (imported lazily — only the probe subprocess and
# the parent's fallback path ever touch JAX)
# ------------------------------------------------------------------ #
def _timed_fetch(fn, *args):
    """Best-of-3 wall time of fn(*args) with a host fetch (real completion)."""
    import jax
    import numpy as np

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def _device_inputs(cfg, B: int, seed: int = 0):
    """Synthetic serving inputs generated ON DEVICE.

    A host-side np.random draw of the B=6144 input set is ~1.7 GB that
    must cross the tunnel (measured ~10 min of syscall-bound I/O — it
    dominated the old bench's startup); one jitted jax.random program
    produces the same-shaped inputs in seconds with nothing on the wire.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        vf = jax.random.normal(k1, (B, cfg.T, cfg.input_video_dim),
                               jnp.float32)
        qf = jax.random.normal(k2, (B, cfg.max_query_length, cfg.word_dim),
                               jnp.float32)
        N = cfg.L * (cfg.L + 1) // 2
        sm = jax.random.uniform(k3, (B, N), jnp.float32)
        vm = jnp.ones((B, cfg.T, 1), jnp.float32)
        qm = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
        lm = jnp.ones((B, cfg.L), jnp.float32)
        mm = jnp.broadcast_to(
            jnp.triu(jnp.ones((cfg.L, cfg.L), jnp.float32)), (B, cfg.L, cfg.L))
        return vf, vm, qf, qm, lm, mm, sm

    vf, vm, qf, qm, lm, mm, sm = gen(jax.random.PRNGKey(seed))
    return (vf, vm, qf, qm, lm, mm), sm


def _setup(cfg):
    import jax

    from video_moment_localization_tpu.models import init_smin_params

    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    arrays, sm = _device_inputs(cfg, B_SERVE)
    return params, arrays, sm


def _make_score_chain(cfg, use_nms: bool = False):
    import jax

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


def _measure_serving(cfg, params, arrays, sm, use_nms: bool = False):
    import numpy as np

    _, score_chain = _make_score_chain(cfg, use_nms=use_nms)
    args = (params, *arrays, sm)
    np.asarray(score_chain(*args))  # compile + first run
    chain_dt = _timed_fetch(score_chain, *args)
    return K_CHAIN * B_SERVE / chain_dt, chain_dt


def _measure_percall(cfg, params, arrays, sm, depth: int = 2, M: int = 12):
    """Per-call WALL throughput with the serving layer's pipelining.

    Each call is one un-chained jitted score_batch dispatch — the pattern
    MomentLocalizer.dispatch/collect runs in production — with up to
    ``depth`` batches in flight, so the ~27 ms/call tunnel dispatch hides
    behind device compute instead of serializing with it (round-3 review:
    the strictly-blocking per-call loop measured 46.7k pairs/s against
    68.8k chained — 32% lost to dispatch latency).
    Returns (pairs/s, wall_dt for M calls).
    """
    import numpy as np

    score_batch, _ = _make_score_chain(cfg)
    args = (params, *arrays, sm)
    np.asarray(score_batch(*args))  # compile + first run
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pend = []
        for _i in range(M):
            pend.append(score_batch(*args))     # async dispatch
            if len(pend) > depth:
                np.asarray(pend.pop(0))         # collect oldest
        for p in pend:
            np.asarray(p)
        best = min(best, time.perf_counter() - t0)
    return M * B_SERVE / best, best


def _make_train_chain(cfg, params):
    """Build the K_TRAIN-chained train-step program + its args.

    Train inputs/labels are generated on device too (see _device_inputs).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from video_moment_localization_tpu.models import smin_forward
    from video_moment_localization_tpu.train.loss import smin_loss

    N = cfg.L * (cfg.L + 1) // 2

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 9)
        vf = jax.random.normal(ks[0], (B_TRAIN, cfg.T, cfg.input_video_dim),
                               jnp.float32)
        qf = jax.random.normal(ks[1], (B_TRAIN, cfg.max_query_length,
                                       cfg.word_dim), jnp.float32)
        sm = jax.random.uniform(ks[2], (B_TRAIN, N), jnp.float32)
        lab = {}
        for i, k in enumerate(("ss", "ys", "se", "ye", "ya")):
            v = jax.random.uniform(ks[3 + i], (B_TRAIN, cfg.L), jnp.float32)
            lab[k] = v if k in ("ss", "se") else (v > 0.5).astype(jnp.float32)
        return vf, qf, sm, lab

    tvf, tqf, tsm, lab = gen(jax.random.PRNGKey(1))
    tvm = jnp.ones((B_TRAIN, cfg.T, 1), jnp.float32)
    tqm = jnp.ones((B_TRAIN, cfg.max_query_length, 1), jnp.float32)
    tlm = jnp.ones((B_TRAIN, cfg.L), jnp.float32)
    batch = {
        "video_features": tvf, "video_mask": tvm, "query_features": tqf,
        "query_mask": tqm, "length_mask": tlm,
        "sm": tsm, "ym": (tsm > 0.5).astype(jnp.float32),
        "sample_mask": jnp.ones(B_TRAIN, jnp.float32),
        **lab,
    }

    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    # The batch MUST be a jit argument, not a closure capture: closed-over
    # device arrays are baked into the lowered program as dense hex
    # literals — measured 292 MB of a 293 MB MLIR at B=512 (vf alone is
    # 268 MB of hex text), which is what the remote compile service's
    # request-size limit rejected at B=1024 (HTTP 413).
    @jax.jit
    def train_chain(p, o, b):
        def body(carry, _):
            p_, o_ = carry

            def loss_fn(p__):
                out = smin_forward(p__, cfg, b["video_features"],
                                   b["video_mask"], b["query_features"],
                                   b["query_mask"], b["length_mask"], None)
                loss, _ = smin_loss(out, b)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(p_)
            updates, o2 = optimizer.update(grads, o_, p_)
            return (optax.apply_updates(p_, updates), o2), loss

        (p, o), losses = jax.lax.scan(body, (p, o), None, length=K_TRAIN)
        return losses[-1]

    return train_chain, (params, opt_state, batch)


def _measure_train(cfg, params):
    """K_TRAIN-chained train-step device throughput (samples/s) at B_TRAIN."""
    import numpy as np

    train_chain, targs = _make_train_chain(cfg, params)
    np.asarray(train_chain(*targs))  # compile
    train_dt = _timed_fetch(train_chain, *targs)
    return K_TRAIN * B_TRAIN / train_dt, train_dt


# ------------------------------------------------------------------ #
# probe subprocess: fused-path measurements, one JSON line per stage
# ------------------------------------------------------------------ #
def _fused_probe() -> None:
    """Measure the fused-kernel serving, training, and NMS-serving paths.

    Runs in a subprocess so a hung Mosaic/remote compile is killable by
    the parent; prints one JSON line per completed measurement so partial
    results survive a mid-probe kill. Value-ordered: serving first (the
    headline), then train, then the soft-NMS variant.
    """
    # Persistent compile cache: no cross-process hits in this environment
    # (session-salted keys), but same-process re-runs and any future fix
    # benefit; harmless otherwise.
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import numpy as np  # noqa: F401  (used via _timed_fetch)

    from __graft_entry__ import _charades_cfg

    cfg = _charades_cfg()  # fused_smi/fused_smi_train=True defaults
    _progress("probe: setup (device-side inputs)")
    params, arrays, sm = _setup(cfg)

    # Each stage is fault-isolated: a failed compile (e.g. the remote
    # compile server's request-size limit) must not kill later stages.
    _progress("probe: compiling + timing fused serving chain")
    pairs, chain_dt = _measure_serving(cfg, params, arrays, sm)
    print(json.dumps({"stage": "serving", "onchip_pairs": pairs,
                      "chain_dt": chain_dt}), flush=True)
    _progress(f"probe: serving {pairs:.0f} pairs/s")

    try:
        _progress("probe: compiling + timing fused train chain")
        train_sps, train_dt = _measure_train(cfg, params)
        print(json.dumps({"stage": "train", "train_sps": train_sps,
                          "train_dt": train_dt}), flush=True)
        _progress(f"probe: train {train_sps:.0f} samples/s")
    except Exception as e:
        _progress(f"probe: train stage failed: {e!r}")

    try:
        _progress("probe: compiling + timing pipelined per-call serving")
        pc_pairs, _ = _measure_percall(cfg, params, arrays, sm)
        print(json.dumps({"stage": "percall", "percall_pairs": pc_pairs}),
              flush=True)
        _progress(f"probe: per-call wall {pc_pairs:.0f} pairs/s")
    except Exception as e:
        _progress(f"probe: percall stage failed: {e!r}")

    try:
        _progress("probe: compiling + timing soft-NMS serving chain")
        nms_pairs, _ = _measure_serving(cfg, params, arrays, sm, use_nms=True)
        print(json.dumps({"stage": "nms", "nms_pairs": nms_pairs}), flush=True)
        _progress(f"probe: nms serving {nms_pairs:.0f} pairs/s")
    except Exception as e:
        _progress(f"probe: nms stage failed: {e!r}")


# ------------------------------------------------------------------ #
# parent: JAX-free coordinator
# ------------------------------------------------------------------ #
def _reader(pipe, lines: list, lock: threading.Lock):
    for ln in iter(pipe.readline, ""):
        ln = ln.strip()
        if ln.startswith("{"):
            with lock:
                lines.append(ln)
    pipe.close()


def main() -> None:
    global _RESULT, _PROBE_PROC
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    # FLOP model: pure python (config + arithmetic), no JAX import.
    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.utils.flops import (
        smin_forward_flops,
        smin_train_step_flops,
    )

    cfg = _charades_cfg()
    serve_flops = smin_forward_flops(cfg, B_SERVE)
    train_flops = smin_train_step_flops(cfg, B_TRAIN)

    note = ("on-chip value from a K={k} in-jit chained scan (no transport); "
            "random weights + synthetic on-device inputs (throughput only, "
            "not accuracy); primary serving number is NMS-OFF like the "
            "reference (utils.py:14), serving_nms_pairs_per_sec adds "
            "soft-NMS; baseline torch-CPU uses batch 64 (compute-bound, "
            "batch-insensitive) vs serving batch {bs} here; MFU vs "
            "{pk:.0f} TFLOP/s peak (bf16)").format(
                k=K_CHAIN, bs=B_SERVE, pk=PEAK_FLOPS / 1e12)

    _RESULT = {
        "metric": "query_video_pairs_scored_per_sec_per_chip",
        "value": None,
        "unit": "pairs/s",
        "vs_baseline": None,
        "serving_mfu_pct": None,
        "serving_batch": B_SERVE,
        "train_batch": B_TRAIN,
        "serving_path": None,
        "note": note,
        "train_samples_per_sec_per_chip": None,
        "train_path": None,
        "serving_nms_pairs_per_sec": None,
        "serving_percall_pairs_per_sec": None,
        "percall_vs_chained_pct": None,
    }

    def apply_probe_line(ln: str) -> None:
        d = json.loads(ln)
        if d.get("stage") == "serving":
            _RESULT.update({
                "value": round(d["onchip_pairs"], 2),
                "vs_baseline": round(
                    d["onchip_pairs"] / BASELINE_PAIRS_PER_SEC, 2),
                "serving_mfu_pct": round(
                    100 * serve_flops * K_CHAIN / d["chain_dt"] / PEAK_FLOPS,
                    2),
                "serving_path": "fused_smi_stack",
            })
        elif d.get("stage") == "train":
            _RESULT.update({
                "train_samples_per_sec_per_chip": round(d["train_sps"], 2),
                "train_path": "fused_smi_train",
                "train_mfu_pct": round(
                    100 * train_flops * K_TRAIN / d["train_dt"] / PEAK_FLOPS,
                    2),
            })
        elif d.get("stage") == "percall":
            _RESULT["serving_percall_pairs_per_sec"] = round(
                d["percall_pairs"], 2)
            if _RESULT["value"]:
                _RESULT["percall_vs_chained_pct"] = round(
                    100 * d["percall_pairs"] / _RESULT["value"], 1)
        elif d.get("stage") == "nms":
            _RESULT["serving_nms_pairs_per_sec"] = round(d["nms_pairs"], 2)

    # ---- phase A: fused probe, streamed under per-stage deadlines ---- #
    probe_enabled = float(os.environ.get("VML_BENCH_FUSED_TIMEOUT", 1)) > 0
    lines: list[str] = []
    applied = 0
    if probe_enabled:
        _progress("spawning fused probe")
        _PROBE_PROC = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--fused-probe"],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lock = threading.Lock()
        t = threading.Thread(target=_reader,
                             args=(_PROBE_PROC.stdout, lines, lock),
                             daemon=True)
        t.start()

        # Serving must land by ~65% of budget; the rest by ~90% — the
        # leftovers cover the parent's XLA fallback when the probe dies
        # early, or just end the bench sooner when it succeeds. (Raised
        # from 0.55/0.85 in round 4: a measured-cold serving stage took
        # 674 s — the remote compile service runs ~1.6x slower some days
        # — leaving only 116 s of margin against the old 825 s deadline;
        # the XLA fallback needs ~90 s, which 10% of budget still covers.)
        serve_deadline = _T0 + 0.65 * BUDGET_S
        rest_deadline = _T0 + 0.90 * BUDGET_S
        while _PROBE_PROC.poll() is None:
            now = time.perf_counter()
            with lock:
                have = len(lines)
            have_serving = have >= 1
            if not have_serving and now > serve_deadline:
                _progress("probe missed the serving deadline — killing")
                _PROBE_PROC.kill()
                break
            if now > rest_deadline:
                _progress("probe past the full deadline — killing")
                _PROBE_PROC.kill()
                break
            time.sleep(1.0)
        t.join(timeout=10)
        with lock:
            for ln in lines[applied:]:
                apply_probe_line(ln)
                applied = len(lines)
        _progress(f"probe done: {len(lines)} stage(s) measured, "
                  f"serving_path={_RESULT['serving_path']}")

    # ---- phase B: XLA fallbacks for anything the probe missed ---- #
    need_serving = _RESULT["value"] is None
    need_train = _RESULT["train_samples_per_sec_per_chip"] is None
    if need_serving or (need_train and _remaining() > 420):
        _progress("fallback: importing JAX in the parent")
        import dataclasses

        xla_cfg = dataclasses.replace(cfg, fused_smi=False,
                                      fused_smi_train=False)
        # Stage-isolated fallbacks: one failed compile must not skip the
        # rest (the round-3 rehearsal lost its NMS number to a train-chain
        # HTTP 413 sharing this block).
        params = arrays = sm = None
        try:
            params, arrays, sm = _setup(xla_cfg)
        except Exception as e:
            _progress(f"fallback setup failed: {e!r}")
        if params is not None and need_serving:
            try:
                _progress("fallback: XLA serving chain")
                pairs, chain_dt = _measure_serving(xla_cfg, params, arrays, sm)
                _RESULT.update({
                    "value": round(pairs, 2),
                    "vs_baseline": round(pairs / BASELINE_PAIRS_PER_SEC, 2),
                    "serving_mfu_pct": round(
                        100 * serve_flops * K_CHAIN / chain_dt / PEAK_FLOPS,
                        2),
                    "serving_path": "xla (fused probe incomplete)",
                })
            except Exception as e:
                _progress(f"fallback serving failed: {e!r}")
        if (params is not None
                and _RESULT["train_samples_per_sec_per_chip"] is None
                and _remaining() > 300):
            try:
                _progress("fallback: XLA train chain")
                sps, train_dt = _measure_train(xla_cfg, params)
                _RESULT.update({
                    "train_samples_per_sec_per_chip": round(sps, 2),
                    "train_path": "xla (fused probe incomplete)",
                    "train_mfu_pct": round(
                        100 * train_flops * K_TRAIN / train_dt / PEAK_FLOPS,
                        2),
                })
            except Exception as e:
                _progress(f"fallback train failed: {e!r}")
        if (params is not None
                and _RESULT["serving_nms_pairs_per_sec"] is None
                and _remaining() > 300):
            try:
                _progress("fallback: XLA soft-NMS serving chain")
                nms_pairs, _ = _measure_serving(xla_cfg, params, arrays, sm,
                                                use_nms=True)
                _RESULT["serving_nms_pairs_per_sec"] = round(nms_pairs, 2)
            except Exception as e:
                _progress(f"fallback nms failed: {e!r}")

    if _RESULT["train_path"] is None:
        _RESULT["train_path"] = "none (no budget left)"

    if _RESULT["value"] is None:
        _progress("no serving measurement landed — exiting nonzero")
        sys.exit(1)
    print(json.dumps(_RESULT))


if __name__ == "__main__":
    if "--fused-probe" in sys.argv:
        _fused_probe()
    else:
        main()
