"""Benchmark: query-video pairs scored per second per chip (north star).

Measures the flagship Charades-STA-scale SMIN (T=64, L=16, C=4, D=512,
3 SMI layers, bf16, packed layout) on one chip:

* **serving** (primary metric): forward + packed proposal scores
  pm*sqrt(ps)*sqrt(pe) + top-k — the work the reference does per eval batch
  (reference models.py forward + utils.py:10-31) — at serving batch B=6144.
  The ``value`` is on-chip: K scored batches chained *inside one jit* via
  lax.scan (each iteration's input depends on the previous counts, so
  nothing is CSE'd or overlapped) — pure device throughput, no transport.
* **training**: the fused train step (fwd+bwd+Adam+metrics) at B=1536,
  K steps chained in one jit through the params/opt-state carry.
* **MFU**: measured matmul-FLOP rate (utils/flops.py, analytic) over the
  chip's peak — the roofline context VERDICT r1 asked for.
* **secondary stages**: pipelined per-call wall throughput, soft-NMS
  serving, and the two harder dataset geometries (ActivityNet serving
  pairs/s, TACoS train samples/s — VERDICT r4 item 3).

Architecture (v5 — VERDICT r4 items 1-2: the bench must emit a
driver-captured number *unconditionally*; the r02/r04 rc=124 failures
were compile/latency lotteries the design must survive):

1. **A JAX-free parent + ONE sequential probe subprocess.** Measured
   2026-08-20: every JAX process pays a one-time device-attach latency
   on its first execution (130-300 s in this window, day-dependent), and
   that latency multiplies under host CPU contention (this host has ONE
   core; two concurrent probes each blew through 560 s attaching —
   exactly how the round-4-era two-probe rehearsal starved itself into
   rc=124). One probe process pays the attach once and runs stages
   strictly in value order: the guaranteed-cheap packed-XLA floor first
   (serving then train — these JSON lines are the result floor, banked
   with the parent within ~2 min of attach), then the fused-kernel
   stages, each of which *upgrades* the floor. A late hang can never
   take down an already-banked line.
2. **Persisted executables.** Every measured program is AOT-cached under
   ``bench_cache/`` via ``jax.experimental.serialize_executable``
   (utils/aot_cache.py): a warm run deserializes compiled TPU binaries
   (~0.6 s each, first call ~1 s — measured) and never talks to the
   remote compile service, whose cold latency is the historical bench
   killer (r4: the fused serving compile hadn't returned at 940+ s vs
   368 s in r3). Cold misses compile once — guarded by a remaining-
   budget estimate so a doomed cold compile is skipped rather than hung
   on — and persist for the next run.
3. **Budget-derived deadlines + stall watchdog.** ``VML_BENCH_BUDGET``
   (driver-settable) defaults pessimistically to 900 s — the r4
   external kill landed at ~1010 s while the bench assumed 1500 s. The
   parent emits best-so-far JSON at budget-45 s unconditionally, earlier
   when the probe finishes, and on SIGTERM/SIGINT. If the probe goes
   ``VML_BENCH_STALL`` (420 s; the one-time device attach gets a longer
   ``VML_BENCH_ATTACH_STALL`` leash of 660 s) without emitting a line,
   the parent kills + respawns it skipping the hung stage — while a
   respawn can still beat the emit deadline, or, when NOTHING is banked
   yet, with any budget at all (a value-less exit is rc=1 regardless,
   and a wedged device attach is cleared by killing the hung client —
   measured 1.4 s re-attach after a >660 s hang). With a result already
   banked it instead lets a late probe ride (a late-returning compile
   still banks stages, a kill forfeits them). The attach leash is
   additionally capped at half the budget so a wedge leaves the respawn
   usable runway. A crashed probe is respawned under the same rules.

Hard-won environment facts (docs/ARCHITECTURE.md "axon quirks") that
shape the above: the host has ONE cpu core; the XLA *compilation cache*
never hits across processes (the tunnel session salts the key — which is
exactly why the serialized-executable cache exists: it bypasses the
cache key and the compile service both); a host->device transfer of the
B=6144 input set costs ~10 minutes of syscall-bound tunnel I/O — so all
synthetic inputs are generated ON DEVICE (one small jitted jax.random
program, itself AOT-cached) and never cross the wire.

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

import contextlib
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

BASELINE_PAIRS_PER_SEC = 9.94  # PyTorch-CPU reference, measured (see docstring)

# Serving batch 6144 fills HBM to ~80% (8192 OOMs at 17.3/15.75 GB) and
# gains ~6% over 4096. Train batch 1536: divisible by 6, which admits the
# BB=6 backward cell under the widened bwd VMEM window — measured 16.4k
# vs 15.1k samples/s at B=1024/BB=4 (+8.2%); batch size itself is neutral
# beyond 1024 (B=2048 at BB=4 measured +0.5%, noise).
B_SERVE = int(os.environ.get("VML_BENCH_B_SERVE", 6144))
B_TRAIN = int(os.environ.get("VML_BENCH_B_TRAIN", 1536))
# Floor-stage batches: small enough that the packed-XLA compiles are the
# cheap kind (11 s / 24 s measured cold), big enough to keep the chip
# busy per dispatch.
B_SERVE_FLOOR = int(os.environ.get("VML_BENCH_B_SERVE_FLOOR", 2048))
B_TRAIN_FLOOR = int(os.environ.get("VML_BENCH_B_TRAIN_FLOOR", 512))
# Secondary geometries (reference config/activitynet.yml:5-13, tacos.yml).
B_ANET = int(os.environ.get("VML_BENCH_B_ANET", 512))
B_TACOS = int(os.environ.get("VML_BENCH_B_TACOS", 256))
# K = scan iters inside one jit. Each dispatched call through the tunnel
# costs ~27 ms host-side regardless of device work, so per-step overhead
# is ~27/K ms. K only sets the scan trip count (the body compiles once).
K_CHAIN = int(os.environ.get("VML_BENCH_K", 16))
K_TRAIN = int(os.environ.get("VML_BENCH_K_TRAIN", 16))
# Pessimistic default: the r4 external kill landed at ~1010 s while the
# bench assumed 1500 s. The driver can raise via the env.
BUDGET_S = float(os.environ.get("VML_BENCH_BUDGET", 900))
EMIT_MARGIN_S = float(os.environ.get("VML_BENCH_EMIT_MARGIN", 45))
# Probe-stall watchdog: the longest a single stage may go without any
# stdout line before the parent kills + (budget permitting) respawns
# skipping it. 420 s > the worst measured single fused compile in a
# usable window; a window worse than that fails every path anyway.
STALL_S = float(os.environ.get("VML_BENCH_STALL", 420))
# The one-time device attach gets a longer leash: measured 30-420+ s
# depending on the window, and killing a slowly-attaching probe is pure
# loss (the respawn re-pays the attach in the same window, while the
# AOT-cached stages after it finish in ~130 s warm). Rehearsed 2026-08-20:
# a 420 s watchdog killed a healthy probe mid-attach at 425 s and exited
# rc=1 with 475 s of budget unused.
ATTACH_STALL_S = float(os.environ.get("VML_BENCH_ATTACH_STALL", 660))
_T0 = float(os.environ.get("VML_BENCH_T0", 0)) or time.perf_counter()

# Peak matmul throughput for MFU context. TPU v5e: ~197 TFLOP/s bf16.
PEAK_FLOPS = float(os.environ.get("VML_PEAK_FLOPS", 197e12))

_RESULT: dict | None = None  # best-so-far, printed by the signal handler
_PROCS: list = []            # probe subprocesses, killed on emit

_TIMING_LOCK_PATH = os.environ.get("VML_BENCH_TIMING_LOCK",
                                   "/tmp/vml_bench_timing.lock")


def _emit_and_exit(signum=None, frame=None):
    for p in _PROCS:
        if p.poll() is None:
            with contextlib.suppress(Exception):
                p.kill()
    if _RESULT is not None and _RESULT.get("value"):
        print(json.dumps(_RESULT), flush=True)
        os._exit(0)
    os._exit(1)


def _progress(msg: str) -> None:
    """Timestamped progress line on stderr (stdout carries only JSON)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


@contextlib.contextmanager
def _timing_lock():
    """Exclusive cross-process lock for device-timing sections.

    The bench's stages are sequential in one process, but external device
    users (an ad-hoc probe, a forgotten background run) must not share
    the chip with a *measurement*, or the queue wait pollutes it."""
    import fcntl

    with open(_TIMING_LOCK_PATH, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


# ------------------------------------------------------------------ #
# measurement helpers (imported lazily — only the probe subprocess
# ever touches JAX; the parent stays a thin coordinator)
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


class StageSkipped(RuntimeError):
    """Stage pre-empted: its cold compile can't fit the remaining budget."""


def _aot(name: str, fn, args, cold_cost: float = 90.0):
    """AOT-cached compile (utils/aot_cache.py) with a cold-budget guard:
    if the cache misses and the remaining budget can't absorb the
    estimated cold-compile cost plus the emit margin, skip the stage
    instead of gambling the whole tail of the bench on one compile."""
    from video_moment_localization_tpu.utils import aot_cache

    if aot_cache.load(name) is None and _remaining() < cold_cost + 60.0:
        raise StageSkipped(
            f"'{name}' is cold (~{cold_cost:.0f}s est.) with only "
            f"{_remaining():.0f}s left")
    return aot_cache.get_or_compile(name, fn, args, log=_progress)


def _gen_inputs(cfg, B: int, name: str, seed: int = 0):
    """Synthetic serving inputs generated ON DEVICE (AOT-cached program).

    A host-side np.random draw of the B=6144 input set is ~1.7 GB that
    must cross the tunnel (measured ~10 min of syscall-bound I/O); one
    jitted jax.random program produces the same-shaped inputs in seconds
    with nothing on the wire.
    """
    import jax
    import jax.numpy as jnp

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

    key = jax.random.PRNGKey(seed)
    vf, vm, qf, qm, lm, mm, sm = _aot(name, gen, (key,), cold_cost=40)(key)
    return (vf, vm, qf, qm, lm, mm), sm


def _make_score_batch(cfg, use_nms: bool = False):
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

    return score_batch


def _make_score_chain(cfg, use_nms: bool = False):
    import jax

    score_batch = _make_score_batch(cfg, use_nms=use_nms)

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

    return score_chain


def _measure_serving(cfg, params, arrays, sm, B: int, aot_name: str,
                     use_nms: bool = False, cold_cost: float = 240.0):
    import numpy as np

    chain = _aot(aot_name, _make_score_chain(cfg, use_nms=use_nms),
                 (params, *arrays, sm), cold_cost=cold_cost)
    args = (params, *arrays, sm)
    np.asarray(chain(*args))  # first run (pays any load/init latency)
    with _timing_lock():
        chain_dt = _timed_fetch(chain, *args)
    return K_CHAIN * B / chain_dt, chain_dt


def _measure_percall(cfg, params, arrays, sm, aot_name: str,
                     depth: int = 2, M: int = 12):
    """Per-call WALL throughput with the serving layer's pipelining.

    Each call is one un-chained jitted score_batch dispatch — the pattern
    MomentLocalizer.dispatch/collect runs in production — with up to
    ``depth`` batches in flight, so the ~27 ms/call tunnel dispatch hides
    behind device compute instead of serializing with it.
    Returns (pairs/s, wall_dt for M calls).
    """
    import numpy as np

    score_batch = _aot(aot_name, _make_score_batch(cfg),
                       (params, *arrays, sm), cold_cost=150)
    args = (params, *arrays, sm)
    np.asarray(score_batch(*args))  # first run
    best = float("inf")
    with _timing_lock():
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


def _make_train_setup(cfg, B: int, gen_name: str):
    """Device-generated train batch + fresh params/opt_state."""
    import jax
    import jax.numpy as jnp
    import optax

    from video_moment_localization_tpu.models import init_smin_params

    N = cfg.L * (cfg.L + 1) // 2

    def gen(key):
        ks = jax.random.split(key, 9)
        vf = jax.random.normal(ks[0], (B, cfg.T, cfg.input_video_dim),
                               jnp.float32)
        qf = jax.random.normal(ks[1], (B, cfg.max_query_length,
                                       cfg.word_dim), jnp.float32)
        sm = jax.random.uniform(ks[2], (B, N), jnp.float32)
        lab = {}
        for i, k in enumerate(("ss", "ys", "se", "ye", "ya")):
            v = jax.random.uniform(ks[3 + i], (B, cfg.L), jnp.float32)
            lab[k] = v if k in ("ss", "se") else (v > 0.5).astype(jnp.float32)
        return vf, qf, sm, lab

    key = jax.random.PRNGKey(1)
    tvf, tqf, tsm, lab = _aot(gen_name, gen, (key,), cold_cost=40)(key)
    tvm = jnp.ones((B, cfg.T, 1), jnp.float32)
    tqm = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
    tlm = jnp.ones((B, cfg.L), jnp.float32)
    batch = {
        "video_features": tvf, "video_mask": tvm, "query_features": tqf,
        "query_mask": tqm, "length_mask": tlm,
        "sm": tsm, "ym": (tsm > 0.5).astype(jnp.float32),
        "sample_mask": jnp.ones(B, jnp.float32),
        **lab,
    }
    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    return optimizer, params, opt_state, batch


def _make_train_chain(cfg, optimizer):
    import jax
    import optax

    from video_moment_localization_tpu.models import smin_forward
    from video_moment_localization_tpu.train.loss import smin_loss

    # The batch MUST be a jit argument, not a closure capture: closed-over
    # device arrays are baked into the lowered program as dense hex
    # literals (measured 292 MB of a 293 MB MLIR at B=512), which the
    # remote compile service's request-size limit rejects.
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

    return train_chain


def _measure_train(cfg, B: int, gen_name: str, aot_name: str,
                   cold_cost: float = 300.0):
    """K_TRAIN-chained train-step device throughput (samples/s) at B."""
    import numpy as np

    optimizer, params, opt_state, batch = _make_train_setup(cfg, B, gen_name)
    targs = (params, opt_state, batch)
    chain = _aot(aot_name, _make_train_chain(cfg, optimizer), targs,
                 cold_cost=cold_cost)
    np.asarray(chain(*targs))  # first run
    with _timing_lock():
        train_dt = _timed_fetch(chain, *targs)
    return K_TRAIN * B / train_dt, train_dt


def _setup_serving(cfg, B: int, gen_name: str):
    import jax

    from video_moment_localization_tpu.models import init_smin_params

    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    arrays, sm = _gen_inputs(cfg, B, gen_name)
    return params, arrays, sm


def _anet_cfg():
    import dataclasses

    from __graft_entry__ import _charades_cfg

    return dataclasses.replace(_charades_cfg(), T=128, L=64,
                               max_query_length=20, input_video_dim=500)


def _tacos_cfg():
    import dataclasses

    from __graft_entry__ import _charades_cfg

    return dataclasses.replace(_charades_cfg(), T=128, L=32,
                               max_query_length=14, input_video_dim=4096)


# ------------------------------------------------------------------ #
# probe subprocess: sequential stages, one JSON line per completed stage
# ------------------------------------------------------------------ #
def _redirect_rehearsal_cache(platform: str) -> None:
    """Point the AOT executable cache at a scratch dir for non-TPU
    rehearsals. Entries are keyed by NAME, so a CPU-compiled
    'gen_serve_b2048' would clobber the committed TPU binary the
    driver's run depends on (fingerprint mismatch -> cold compile — the
    exact failure the cache exists to prevent). An explicit
    ``VML_AOT_CACHE`` (including ``off``) is respected."""
    os.environ.setdefault(
        "VML_AOT_CACHE",
        os.path.join(tempfile.gettempdir(), f"vml_aot_{platform}"))


def _probe(skip: set[str]) -> None:
    """All stages in one process (one attach), floor first.

    Emits ``{"start": <stage>}`` before and ``{"stage": <stage>, ...}``
    after each stage; the parent banks result lines as they land, so a
    hang or crash in stage N can never lose stages 1..N-1."""
    import dataclasses

    import jax

    # CPU rehearsal hook (the axon TPU plugin ignores JAX_PLATFORMS, so a
    # plain env var cannot force CPU — same trick as tests/conftest.py).
    platform = os.environ.get("VML_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
        _redirect_rehearsal_cache(platform)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _charades_cfg

    t_attach = time.perf_counter()
    # The attach is announced on stdout so the parent can give it a longer
    # leash than in-stage stalls: measured windows range 30 s to 420+ s for
    # this first execution, and killing a slowly-attaching probe is pure
    # loss (the respawn re-pays the attach in the same window, while the
    # AOT-cached stages after it need only ~130 s warm).
    print(json.dumps({"start": "attach"}), flush=True)
    np.asarray(jnp.ones((8, 8)).sum())  # device attach (one-time latency)
    print(json.dumps({"stage": "attach",
                      "dt": time.perf_counter() - t_attach}), flush=True)
    _progress(f"probe: device attached in "
              f"{time.perf_counter() - t_attach:.1f}s")

    fused_cfg = _charades_cfg()  # fused_smi/fused_smi_train=True defaults
    floor_cfg = dataclasses.replace(fused_cfg, fused_smi=False,
                                    fused_smi_train=False, use_pallas=False)
    setups: dict = {}

    def floor_serving():
        p, a, s = setups["floor"] = _setup_serving(
            floor_cfg, B_SERVE_FLOOR, f"gen_serve_b{B_SERVE_FLOOR}")
        pairs, dt = _measure_serving(
            floor_cfg, p, a, s, B_SERVE_FLOOR,
            f"xla_serve_chain_b{B_SERVE_FLOOR}_k{K_CHAIN}", cold_cost=90)
        return {"onchip_pairs": pairs, "chain_dt": dt, "batch": B_SERVE_FLOOR}

    def floor_train():
        sps, dt = _measure_train(
            floor_cfg, B_TRAIN_FLOOR, f"gen_train_b{B_TRAIN_FLOOR}",
            f"xla_train_chain_b{B_TRAIN_FLOOR}_k{K_TRAIN}", cold_cost=120)
        return {"train_sps": sps, "train_dt": dt, "batch": B_TRAIN_FLOOR}

    def _fused_setup():
        if "fused" not in setups:
            setups["fused"] = _setup_serving(fused_cfg, B_SERVE,
                                             f"gen_serve_b{B_SERVE}")
        return setups["fused"]

    def serving():
        p, a, s = _fused_setup()
        pairs, dt = _measure_serving(
            fused_cfg, p, a, s, B_SERVE,
            f"fused_serve_chain_b{B_SERVE}_k{K_CHAIN}", cold_cost=260)
        return {"onchip_pairs": pairs, "chain_dt": dt, "batch": B_SERVE}

    def train():
        sps, dt = _measure_train(
            fused_cfg, B_TRAIN, f"gen_train_b{B_TRAIN}",
            f"fused_train_chain_b{B_TRAIN}_k{K_TRAIN}", cold_cost=320)
        return {"train_sps": sps, "train_dt": dt, "batch": B_TRAIN}

    def percall():
        p, a, s = _fused_setup()
        return {"percall_pairs": _measure_percall(
            fused_cfg, p, a, s, f"fused_score_batch_b{B_SERVE}")[0]}

    def nms():
        p, a, s = _fused_setup()
        return {"nms_pairs": _measure_serving(
            fused_cfg, p, a, s, B_SERVE,
            f"fused_serve_nms_chain_b{B_SERVE}_k{K_CHAIN}",
            use_nms=True, cold_cost=260)[0]}

    def anet_serving():
        acfg = _anet_cfg()
        p, a, s = _setup_serving(acfg, B_ANET, f"gen_anet_b{B_ANET}")
        pairs, dt = _measure_serving(
            acfg, p, a, s, B_ANET,
            f"anet_serve_chain_b{B_ANET}_k{K_CHAIN}", cold_cost=120)
        return {"anet_pairs": pairs, "chain_dt": dt, "batch": B_ANET}

    def tacos_train():
        tcfg = _tacos_cfg()
        sps, dt = _measure_train(
            tcfg, B_TACOS, f"gen_tacos_train_b{B_TACOS}",
            f"tacos_train_chain_b{B_TACOS}_k{K_TRAIN}", cold_cost=160)
        return {"tacos_sps": sps, "train_dt": dt, "batch": B_TACOS}

    # Strict value order: the two floors are the lifeline, fused serving
    # is the headline upgrade, fused train the second, then the extras.
    stages = [
        ("floor_serving", floor_serving),
        ("floor_train", floor_train),
        ("serving", serving),
        ("train", train),
        ("percall", percall),
        ("nms", nms),
        ("anet_serving", anet_serving),
        ("tacos_train", tacos_train),
    ]
    only = os.environ.get("VML_BENCH_STAGES")
    if only:
        wanted = {s.strip() for s in only.split(",")}
        stages = [s for s in stages if s[0] in wanted]
    for name, fn in stages:
        if name in skip:
            _progress(f"probe: skipping '{name}' (parent said so)")
            continue
        if _remaining() < 40:
            _progress(f"probe: {_remaining():.0f}s left — stopping before "
                      f"'{name}'")
            break
        _progress(f"probe: stage '{name}'")
        print(json.dumps({"start": name}), flush=True)
        try:
            payload = fn()
            print(json.dumps({"stage": name, **payload}), flush=True)
        except StageSkipped as e:
            _progress(f"probe: stage '{name}' skipped: {e}")
        except Exception as e:  # noqa: BLE001 - stage isolation by design
            _progress(f"probe: stage '{name}' failed: {e!r}")
    _progress("probe: done")


# ------------------------------------------------------------------ #
# parent: JAX-free coordinator
# ------------------------------------------------------------------ #
def _reader(pipe, lines: list, lock: threading.Lock, last_activity: list):
    for ln in iter(pipe.readline, ""):
        ln = ln.strip()
        if ln.startswith("{"):
            with lock:
                lines.append(ln)
                last_activity[0] = time.perf_counter()
    pipe.close()


def _spawn(skip: set[str]):
    env = dict(os.environ)
    env["VML_BENCH_T0"] = str(_T0)
    argv = [sys.executable, os.path.abspath(__file__), "--probe"]
    if skip:
        argv += ["--skip", ",".join(sorted(skip))]
    p = subprocess.Popen(
        argv, stdout=subprocess.PIPE, stderr=sys.stderr, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    _PROCS.append(p)
    return p


def main() -> None:
    global _RESULT
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    # FLOP model: pure python (config + arithmetic), no JAX import.
    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.utils.flops import (
        smin_forward_flops,
        smin_train_step_flops,
    )

    cfg = _charades_cfg()

    note = ("on-chip value from a K={k} in-jit chained scan (no transport); "
            "random weights + synthetic on-device inputs (throughput only, "
            "not accuracy); primary serving number is NMS-OFF like the "
            "reference (utils.py:14), serving_nms_pairs_per_sec adds "
            "soft-NMS; baseline torch-CPU uses batch 64 (compute-bound, "
            "batch-insensitive); MFU vs {pk:.0f} TFLOP/s peak (bf16); "
            "programs AOT-cached under bench_cache/ "
            "(see utils/aot_cache.py)").format(k=K_CHAIN,
                                               pk=PEAK_FLOPS / 1e12)

    _RESULT = {
        "metric": "query_video_pairs_scored_per_sec_per_chip",
        "value": None,
        "unit": "pairs/s",
        "vs_baseline": None,
        "serving_mfu_pct": None,
        "serving_batch": None,
        "train_batch": None,
        "serving_path": None,
        "note": note,
        "train_samples_per_sec_per_chip": None,
        "train_mfu_pct": None,
        "train_path": None,
        "serving_nms_pairs_per_sec": None,
        "serving_percall_pairs_per_sec": None,
        "percall_vs_chained_pct": None,
        "activitynet_pairs_per_sec": None,
        "tacos_train_samples_per_sec": None,
    }

    def apply_line(ln: str) -> None:
        d = json.loads(ln)
        st = d.get("stage")
        if st is None:
            return  # {"start": ...} marker — activity only
        if st == "serving" or (st == "floor_serving"
                               and _RESULT["serving_path"] is None):
            B = d["batch"]
            _RESULT.update({
                "value": round(d["onchip_pairs"], 2),
                "vs_baseline": round(
                    d["onchip_pairs"] / BASELINE_PAIRS_PER_SEC, 2),
                "serving_mfu_pct": round(
                    100 * smin_forward_flops(cfg, B) * K_CHAIN
                    / d["chain_dt"] / PEAK_FLOPS, 2),
                "serving_batch": B,
                "serving_path": ("fused_smi_stack" if st == "serving"
                                 else f"xla_floor(B={B})"),
            })
        elif st == "train" or (st == "floor_train"
                               and _RESULT["train_path"] is None):
            B = d["batch"]
            _RESULT.update({
                "train_samples_per_sec_per_chip": round(d["train_sps"], 2),
                "train_batch": B,
                "train_path": ("fused_smi_train" if st == "train"
                               else f"xla_floor(B={B})"),
                "train_mfu_pct": round(
                    100 * smin_train_step_flops(cfg, B) * K_TRAIN
                    / d["train_dt"] / PEAK_FLOPS, 2),
            })
        elif st == "percall":
            _RESULT["serving_percall_pairs_per_sec"] = round(
                d["percall_pairs"], 2)
            if _RESULT["value"]:
                _RESULT["percall_vs_chained_pct"] = round(
                    100 * d["percall_pairs"] / _RESULT["value"], 1)
        elif st == "nms":
            _RESULT["serving_nms_pairs_per_sec"] = round(d["nms_pairs"], 2)
        elif st == "anet_serving":
            _RESULT["activitynet_pairs_per_sec"] = round(d["anet_pairs"], 2)
        elif st == "tacos_train":
            _RESULT["tacos_train_samples_per_sec"] = round(d["tacos_sps"], 2)

    # ---- one sequential probe; watchdog kills + respawns on stall ---- #
    lines: list[str] = []
    lock = threading.Lock()
    last_activity = [time.perf_counter()]
    skip: set[str] = set()
    _progress(f"budget {BUDGET_S:.0f}s, emit at {BUDGET_S - EMIT_MARGIN_S:.0f}s"
              f", stall watchdog {STALL_S:.0f}s")
    proc = _spawn(skip)
    thread = threading.Thread(target=_reader,
                              args=(proc.stdout, lines, lock, last_activity),
                              daemon=True)
    thread.start()

    emit_deadline = _T0 + max(BUDGET_S - EMIT_MARGIN_S, 60.0)
    applied = 0
    started: list[str] = []  # stage-start markers, in order
    done: set[str] = set()
    spawns = 1  # respawn backstop: a fast-crashing probe must not loop
    riding = False

    def respawn() -> bool:
        """Kill + respawn the probe skipping completed stages. A respawn
        pays the device attach again; only worth it with real budget —
        UNLESS nothing is banked yet, in which case a respawn is the only
        path to any result at all (emitting with value=None is rc=1
        regardless), so it is worth trying with any budget that could
        still bank the warm floor stage (measured 2026-08-20: 1.4 s
        attach immediately after killing a wedged client + ~25 s cached
        floor_serving)."""
        nonlocal proc, thread, spawns
        bar = 380 if _RESULT["value"] is not None else 60
        if _remaining() <= bar or spawns >= 3:
            return False
        spawns += 1
        skip.update(done - {"attach"})
        _progress(f"respawning probe ({spawns}), skipping {sorted(skip)}")
        proc = _spawn(skip)
        thread = threading.Thread(
            target=_reader, args=(proc.stdout, lines, lock, last_activity),
            daemon=True)
        thread.start()
        with lock:
            last_activity[0] = time.perf_counter()
        return True

    while True:
        with lock:
            for ln in lines[applied:]:
                d = json.loads(ln)
                if d.get("start"):
                    started.append(d["start"])
                elif d.get("stage"):
                    done.add(d["stage"])
                apply_line(ln)
            applied = len(lines)
            stalled_for = time.perf_counter() - last_activity[0]
        hung = next((s for s in reversed(started) if s not in done), None)
        if proc.poll() is not None:
            rc = proc.returncode
            _progress(f"probe exited rc={rc}")
            # A crash (signal/exception) with stages unfinished is worth
            # one more attempt — e.g. a transient device error at attach.
            if rc == 0 or not respawn():
                break
            continue
        if time.perf_counter() > emit_deadline:
            _progress("emit deadline reached — killing probe, emitting "
                      "best-so-far")
            with contextlib.suppress(Exception):
                proc.kill()
            break
        if hung == "attach":
            # Budget-aware attach leash. In a wedge window (observed
            # 2026-08-20, ~22:00-22:40 UTC) attach is a lottery: three
            # bench attaches hung >450/>660/>400 s while four interleaved
            # fresh processes attached in 1.4-158 s — same host, same
            # code. A hung attach has never been observed to return, so
            # waiting past half the budget only burns respawn chances;
            # genuine slow-window attaches (worst completed: ~420 s)
            # still fit under 0.5 * the default 900 s budget.
            leash = min(ATTACH_STALL_S, max(0.5 * BUDGET_S, 300.0))
            if _RESULT["value"] is None:
                # Nothing banked yet: shrink the leash so every remaining
                # slice of budget buys another attach attempt (more
                # lottery tickets — a fresh attach needs 1-160 s plus
                # ~35 s for the cached floor stage).
                leash = max(
                    min(leash, emit_deadline - time.perf_counter() - 100.0),
                    60.0)
        else:
            leash = STALL_S
        if stalled_for > leash:
            if _remaining() > (380 if _RESULT["value"] is not None
                               else 60) and spawns < 3:
                _progress(f"probe stalled {stalled_for:.0f}s in stage "
                          f"'{hung}' — killing + respawning")
                with contextlib.suppress(Exception):
                    proc.kill()
                proc.wait()
                if hung and hung != "attach":
                    skip.add(hung)
                respawn()
            elif not riding:
                # Too late for a respawn to beat the emit deadline; a kill
                # would only forfeit the chance that the slow attach or
                # compile still returns — let the probe ride.
                riding = True
                _progress(f"probe stalled {stalled_for:.0f}s in stage "
                          f"'{hung}' — no respawn budget, riding to the "
                          f"emit deadline")
        time.sleep(1.0)
    thread.join(timeout=10)
    with lock:
        for ln in lines[applied:]:
            apply_line(ln)

    if _RESULT["train_path"] is None:
        _RESULT["train_path"] = "none (no stage landed in budget)"
    if _RESULT["value"] is None:
        _progress("no serving measurement landed — exiting nonzero")
        sys.exit(1)
    print(json.dumps(_RESULT))


if __name__ == "__main__":
    if "--probe" in sys.argv:
        skip_arg = ""
        if "--skip" in sys.argv:
            skip_arg = sys.argv[sys.argv.index("--skip") + 1]
        _probe({s for s in skip_arg.split(",") if s})
    else:
        main()
