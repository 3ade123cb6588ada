"""Dual-train accuracy-parity harness (the BASELINE.md operational protocol).

Trains the PyTorch reference (`/root/reference/main.py:231-276`, with the
one-line `reduction='none'` fix its weighted BCE needs to execute at all —
see PARITY.md #1) and this framework side-by-side on an identical on-disk
Charades-style fixture, from identical initial weights (ours exported via
models/port.py). Both runs write the reference stats.json schema; `report`
renders PARITY_RUN.md with trajectory and final-metric tables.

Subcommands (typical sequence):
    gen          — write the learnable synthetic fixture + shared parity.yml
    export-init  — seed-initialized params -> reference-format init.pt
    init-eval    — epoch-0 eval loss/metrics for either side (tight check:
                   the eval path has no jitter/shuffle, so from shared
                   weights the two stacks must agree to float tolerance)
    ref          — train the reference (torch CPU) on the fixture
    ours         — train this framework on the fixture (same config file)
    report       — compare stats and write PARITY_RUN.md

Reference runs are reproducible here via np.random.seed (the reference
leaves NumPy unseeded — PARITY.md #13; seeding it changes nothing about the
jitter distribution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
REF = "/root/reference"
sys.path.insert(0, REPO)

CONFIG_TEMPLATE = """\
# Shared parity-run config (reference-compatible 20-key schema).
dataset:            "charadessta"
data_dir:           "{data_dir}"
T:                  {T}
L:                  {L}
C:                  4
model:              "SMIN"
d:                  512
dl:                 128
input_video_dim:    {input_video_dim}
max_query_length:   {max_query_length}
lstm_hidden_size:   256
num_smi_layers:     {num_smi_layers}
optimizer:          "Adam"
lr:                 0.0005
num_epochs:         {num_epochs}
batch_size:         {batch_size}
num_workers:        {num_workers}
seed:               {seed}
checkpoint_path:    "{checkpoint_path}"
resume_training:    {resume}
"""

# Model-geometry presets. 'charades' is the flagship Charades-STA shape
# (/root/reference/config/charadessta.yml). 'anet' is the ActivityNet
# model geometry (/root/reference/config/activitynet.yml:5-13 — T=128,
# L=64, C3D dim 500, query length 20): at L=64 the proposal map has
# N=2080 cells (NC=8320 rows), which routes OUR train step through the
# fused content-train kernel (ops/content_train_pallas.py — the
# whole-layer kernel is row-capped out, exactly as in production), so a
# trained-accuracy trajectory at this preset validates that path. The
# fixture stays charades-LAYOUT (the readers' format parity is pinned
# separately by the committed golden shard, tests/test_golden_realformat.py);
# dims are what the kernels see. batch_size 16 keeps the reference's
# torch-CPU activation memory (~1 GB/tensor at B=64) tractable on the
# 1-core parity host — both sides use the identical config.
PRESETS = {
    "charades": dict(T=64, L=16, input_video_dim=1024, max_query_length=13,
                     batch_size=64),
    "anet": dict(T=128, L=64, input_video_dim=500, max_query_length=20,
                 batch_size=16),
}


def _force_cpu_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")


# --------------------------------------------------------------------- #
# gen
# --------------------------------------------------------------------- #
def cmd_gen(args):
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    preset = PRESETS[args.preset]
    write_charades_style_dir(
        args.root,
        queries_per_video=args.queries,
        input_video_dim=preset["input_video_dim"],
        seed=args.seed,
        signal_strength=args.signal,
        videos_per_split={"train": args.train_videos, "test": args.test_videos},
    )
    cfg_path = os.path.join(args.root, "parity.yml")
    with open(cfg_path, "w") as f:
        f.write(
            CONFIG_TEMPLATE.format(
                data_dir=args.root,
                num_epochs=args.epochs,
                num_workers=0,
                seed=args.seed,
                num_smi_layers=args.smi_layers,
                checkpoint_path=os.path.join(args.root, "ckpt_ours"),
                resume="False",
                **preset,
            )
        )
    print(f"fixture: {args.train_videos}x{args.queries} train / "
          f"{args.test_videos}x{args.queries} test samples at {args.root}")
    print(f"config: {cfg_path}")


# --------------------------------------------------------------------- #
# export-init
# --------------------------------------------------------------------- #
def cmd_export_init(args):
    _force_cpu_jax()
    import jax
    import numpy as np
    import torch

    from video_moment_localization_tpu.config import load_config
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.port import (
        torch_state_dict_from_params,
    )

    cfg = load_config(args.config)
    params = init_smin_params(jax.random.PRNGKey(cfg.seed), cfg.model)
    sd = torch_state_dict_from_params(params, cfg.model)
    torch.save(
        {"epoch": 0,
         "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd.items()}},
        args.out,
    )
    print(f"wrote seed-{cfg.seed} initial weights (reference layout) -> {args.out}")


# --------------------------------------------------------------------- #
# reference side
# --------------------------------------------------------------------- #
def _load_reference(data_dir: str):
    """Import the reference main module with the torchtext shim installed."""
    os.environ.setdefault(
        "VML_GLOVE_TXT", os.path.join(data_dir, "glove/glove.6B.300d.txt")
    )
    sys.path.insert(0, SCRIPTS)
    import torchtext_shim  # noqa: F401  (installs the fake torchtext)

    sys.path.insert(0, REF)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_main", os.path.join(REF, "main.py")
    )
    ref_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_main)
    return ref_main


def _fixed_bce_loss():
    """Reference main.py:89-108 semantics with reduction='none' (the
    documented one-line fix; the committed code crashes on torch>=2.0)."""
    import torch

    def bce_loss(p, y, s, mask):
        y_f = y.float()
        if s is not None:
            pos = torch.nn.BCELoss(weight=s * y.long(), reduction="none")
            neg = torch.nn.BCELoss(weight=(1 - s) * (1 - y.long()),
                                   reduction="none")
            loss = pos(p, y_f) + neg(1 - p, 1 - y_f)
            loss = loss * mask
        else:
            loss = torch.nn.BCELoss(reduction="none")(p, y_f) * mask
        dims = (1, 2) if mask.dim() == 3 else (1,)
        loss = loss.sum(dim=dims) / mask.sum(dim=dims)
        return loss.mean()

    return bce_loss


def _ref_params(config_path: str, experiment: str, num_epochs: int | None):
    import yaml

    with open(config_path) as f:
        params = yaml.safe_load(f)
    params["experiment"] = experiment
    params["test"] = False
    if num_epochs is not None and num_epochs > 0:
        params["num_epochs"] = num_epochs
    return params


def cmd_ref(args):
    import numpy as np
    import torch

    params = _ref_params(args.config, args.experiment, args.epochs)
    params["checkpoint_path"] = args.out_dir
    os.makedirs(args.out_dir, exist_ok=True)
    ref_main = _load_reference(params["data_dir"])
    ref_main.bce_loss = _fixed_bce_loss()

    seed = args.seed if args.seed is not None else params["seed"]
    torch.manual_seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(args.threads)
    device = torch.device("cpu")
    params["device"] = device

    model = ref_main.get_model(params).to(device)
    if args.init:
        sd = torch.load(args.init, weights_only=False)
        model.load_state_dict(sd["model"], strict=True)
        print(f"loaded shared initial weights from {args.init}")

    train_ds, eval_ds = ref_main.get_training_datasets(params)
    train_loader = ref_main.get_dataloader(params, train_ds, shuffle=True)
    eval_loader = ref_main.get_dataloader(params, eval_ds, shuffle=False)
    print(f"reference datasets: {len(train_ds)} train / {len(eval_ds)} eval")

    with torch.no_grad():
        t0 = time.time()
        eval_loss, eval_metrics = ref_main.eval_epoch(
            model, eval_loader, device, params
        )
    init_eval = {"eval_loss": eval_loss,
                 **{k: v for k, v in eval_metrics.items()},
                 "wall_s": time.time() - t0}
    with open(os.path.join(args.out_dir, "init_eval.json"), "w") as f:
        json.dump(init_eval, f, indent=1)
    print(f"init eval: loss={eval_loss:.6f} ({init_eval['wall_s']:.0f}s)")

    if params["num_epochs"] > 0:
        t0 = time.time()
        ref_main.train_model(model, train_loader, eval_loader, device, params)
        wall = time.time() - t0
        n_pairs = params["num_epochs"] * (len(train_ds) + len(eval_ds))
        with open(os.path.join(args.out_dir, "wallclock.json"), "w") as f:
            json.dump({"wall_s": wall, "epochs": params["num_epochs"],
                       "train_samples": len(train_ds),
                       "eval_samples": len(eval_ds),
                       "samples_per_s": n_pairs / wall,
                       "threads": args.threads}, f, indent=1)
        print(f"reference training done in {wall:.0f}s")


# --------------------------------------------------------------------- #
# our side
# --------------------------------------------------------------------- #
def cmd_ours(args):
    if args.cpu:
        _force_cpu_jax()
    from video_moment_localization_tpu.config import load_config
    from video_moment_localization_tpu.data.pipeline import BatchLoader
    from video_moment_localization_tpu.train.trainer import Trainer, build_datasets

    cfg = load_config(args.config, num_epochs_override=args.epochs or 0)
    if args.seed is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.out_dir:
        cfg.checkpoint_path = args.out_dir
    os.makedirs(cfg.checkpoint_path, exist_ok=True)

    trainer = Trainer(cfg)
    if args.init:
        # Load the SAME reference-format initial weights every run loads
        # (both sides, all seeds): the seed then drives only shuffle order
        # and sampling jitter, so the per-side seed spreads are symmetric
        # measures of training stochasticity (VERDICT r3 item 3).
        import torch

        from video_moment_localization_tpu.models.port import (
            params_from_torch_state_dict,
        )
        from video_moment_localization_tpu.parallel.mesh import put_replicated

        sd = torch.load(args.init, weights_only=False)["model"]
        trainer.params = put_replicated(
            params_from_torch_state_dict(sd, cfg.model), trainer.mesh)
        print(f"loaded shared initial weights from {args.init}")
    train_ds, eval_ds = build_datasets(cfg)
    print(f"our datasets: {len(train_ds)} train / {len(eval_ds)} eval")
    eval_loader = BatchLoader(eval_ds, cfg.batch_size, shuffle=False,
                              num_workers=cfg.num_workers, seed=cfg.seed)

    t0 = time.time()
    eval_loss, eval_metrics = trainer._run_epoch(eval_loader, 0, False)
    init_eval = {"eval_loss": eval_loss, **eval_metrics,
                 "wall_s": time.time() - t0}
    with open(os.path.join(cfg.checkpoint_path, "init_eval.json"), "w") as f:
        json.dump(init_eval, f, indent=1)
    print(f"init eval: loss={eval_loss:.6f} ({init_eval['wall_s']:.0f}s)")

    if cfg.num_epochs > 0:
        train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                                   num_workers=cfg.num_workers, seed=cfg.seed)
        t0 = time.time()
        trainer.fit(train_loader, eval_loader)
        wall = time.time() - t0
        n_pairs = cfg.num_epochs * (len(train_ds) + len(eval_ds))
        with open(os.path.join(cfg.checkpoint_path, "wallclock.json"), "w") as f:
            json.dump({"wall_s": wall, "epochs": cfg.num_epochs,
                       "train_samples": len(train_ds),
                       "eval_samples": len(eval_ds),
                       "samples_per_s": n_pairs / wall}, f, indent=1)
        print(f"our training done in {wall:.0f}s")


# --------------------------------------------------------------------- #
# report
# --------------------------------------------------------------------- #
METRICS = [f"R@{n}, IoU={m}" for n in (1, 5) for m in (0.1, 0.3, 0.5, 0.7)]


def _load_stats(ckpt_dir: str, experiment: str):
    with open(os.path.join(ckpt_dir, f"{experiment}_stats.json")) as f:
        stats = json.load(f)
    init_path = os.path.join(ckpt_dir, "init_eval.json")
    init = json.load(open(init_path)) if os.path.exists(init_path) else None
    wall_path = os.path.join(ckpt_dir, "wallclock.json")
    wall = json.load(open(wall_path)) if os.path.exists(wall_path) else None
    return stats, init, wall


def _section(w, args, ref_dirs, ours_dirs, title):
    """One preset's parity tables: N ref seeds x M ours seeds, symmetric
    per-seed columns + per-side spreads (VERDICT r3 item 3: the round-3
    report compared a single ours draw against a 3-sample ref spread)."""
    refs, ourss = [], []
    ref_init = our_init = ref_wall = our_wall = None
    for d in ref_dirs:
        s, init, wall = _load_stats(d, args.experiment)
        refs.append(s)
        ref_init, ref_wall = ref_init or init, ref_wall or wall
    for d in ours_dirs:
        s, init, wall = _load_stats(d, args.experiment)
        ourss.append(s)
        our_init, our_wall = our_init or init, our_wall or wall

    w(f"## {title}")
    w("")

    w("### Epoch-0 eval from shared weights (tight end-to-end check)")
    w("")
    w("Same initial weights, deterministic eval path (no jitter, no shuffle):")
    w("this compares the full stack — file reading, sampling, label generation,")
    w("model forward, loss, metrics — between the two frameworks.")
    w("")
    w("| quantity | reference (torch) | ours (JAX) | abs diff |")
    w("|---|---|---|---|")
    if ref_init and our_init:
        for k in ["eval_loss"] + METRICS:
            r, o = ref_init.get(k), our_init.get(k)
            if r is None or o is None:
                continue
            w(f"| {k} | {r:.6f} | {o:.6f} | {abs(r - o):.2e} |")
    w("")

    ref0 = refs[0]
    w(f"### Training trajectories ({len(ref0['epoch'])} epochs, "
      f"{args.train_samples} train / {args.test_samples} eval samples)")
    w("")
    rhdr = "".join(f" ref s{j + 1} |" for j in range(len(refs)))
    ohdr = "".join(f" ours s{j + 1} |" for j in range(len(ourss)))
    w(f"| epoch | train_loss:{rhdr}{ohdr} eval_loss:{rhdr}{ohdr}")
    w("|---" * (1 + 2 * (len(refs) + len(ourss))) + "|")
    for i, ep in enumerate(ref0["epoch"]):
        tl = "".join(f" {s['train_loss'][i]:.4f} |" for s in refs + ourss)
        el = "".join(f" {s['eval_loss'][i]:.4f} |" for s in refs + ourss)
        w(f"| {ep} |{tl}{el}")
    w("")

    w("### Final-epoch eval metrics")
    w("")
    w(f"| metric |{rhdr}{ohdr} ours-ref (means) | ref spread | ours spread |")
    w("|---" * (4 + len(refs) + len(ourss)) + "|")
    worst_gap = worst_ref_spread = worst_our_spread = 0.0
    for k in METRICS:
        rs = [s[f"eval_{k}"][-1] for s in refs]
        os_ = [s[f"eval_{k}"][-1] for s in ourss]
        gap = sum(os_) / len(os_) - sum(rs) / len(rs)
        ref_spread = max(rs) - min(rs)
        our_spread = max(os_) - min(os_)
        worst_gap = max(worst_gap, abs(gap))
        worst_ref_spread = max(worst_ref_spread, ref_spread)
        worst_our_spread = max(worst_our_spread, our_spread)
        cells = "".join(f" {v:.4f} |" for v in rs + os_)
        w(f"| {k} |{cells} {gap:+.4f} | {ref_spread:.4f} | {our_spread:.4f} |")
    w("")
    w(f"Largest |mean(ours) - mean(ref)| gap: **{worst_gap:.4f}**; worst "
      f"ref seed spread **{worst_ref_spread:.4f}**; worst ours seed spread "
      f"**{worst_our_spread:.4f}** (recall fractions in [0,1]). The")
    w("synthetic-fixture bar is the sides' own seed-to-seed variance; the")
    w("±0.3 percentage-point north-star tolerance in BASELINE.json applies to")
    w("the real-data run (blocked: zero egress).")
    w("")

    if ref_wall and our_wall:
        w("### Wall-clock (same fixture, same epochs, seed 1)")
        w("")
        w("| side | hardware | total s | samples/s |")
        w("|---|---|---|---|")
        w(f"| reference | 1x CPU core (torch {args.torch_version}) | "
          f"{ref_wall['wall_s']:.0f} | {ref_wall['samples_per_s']:.1f} |")
        w(f"| ours | 1x TPU v5e chip (axon tunnel) | {our_wall['wall_s']:.0f} | "
          f"{our_wall['samples_per_s']:.1f} |")
        w(f"\nEnd-to-end speedup: **{ref_wall['wall_s'] / our_wall['wall_s']:.0f}x** "
          "(tunnel-RTT-bound on our side; see BENCH notes).")
        w("")


def cmd_report(args):
    lines = []
    w = lines.append
    w("# PARITY_RUN — dual-train accuracy parity vs the PyTorch reference")
    w("")
    w("Protocol (BASELINE.md 'operational baseline' / VERDICT r1 item 1): the")
    w("reference (`/root/reference/main.py`, with the documented one-line")
    w("`reduction='none'` fix — PARITY.md #1) and this framework trained on the")
    w("**same on-disk fixture** from the **same initial weights** (exported via")
    w("`models/port.py::torch_state_dict_from_params`, loaded `strict=True`),")
    w("at 3 seeds EACH side (seeds 43/44/45; the fixture is fixed, the seed")
    w("drives init + shuffle + jitter). Fixtures: learnable Charades-style")
    w("synthetic data (query-conditioned span signal, `data/synthetic.py`),")
    w("generated by `scripts/parity_run.py gen`; the reference runs use")
    w("`scripts/torchtext_shim.py` to feed the reference the identical GloVe")
    w("table without torchtext/downloads.")
    w("")
    w("Two model geometries (see PRESETS in scripts/parity_run.py):")
    w("* **Charades dims** (T=64, L=16, dv=1024): ours trains through the")
    w("  fused whole-layer SMI train kernel (`ops/smin_train_pallas.py`).")
    w("* **ActivityNet dims** (T=128, L=64, dv=500, mql=20, batch 16 — ")
    w("  `/root/reference/config/activitynet.yml:5-13`): NC=8320 rows gate the")
    w("  whole-layer kernel out, so ours trains through the fused content-unit")
    w("  kernel (`ops/content_train_pallas.py`) — the production ActivityNet")
    w("  route. Fixture stays Charades-LAYOUT (reader-format parity is pinned")
    w("  separately by tests/test_golden_realformat.py).")
    w("")
    w("Sources of run-to-run noise that remain (by design, matching the")
    w("reference's own training variance): torch vs JAX batch shuffle order and")
    w("train-time sampling jitter (PARITY.md #13). Eval has neither, so the")
    w("epoch-0 eval check below is tight.")
    w("")

    _section(w, args, args.ref_dirs, args.ours_dirs,
             "Charades dims (T=64, L=16, dv=1024)")
    if args.anet_ref_dirs and args.anet_ours_dirs:
        args_anet_train = args.anet_train_samples or args.train_samples
        args_anet_test = args.anet_test_samples or args.test_samples
        saved = args.train_samples, args.test_samples
        args.train_samples, args.test_samples = args_anet_train, args_anet_test
        _section(w, args, args.anet_ref_dirs, args.anet_ours_dirs,
                 "ActivityNet dims (T=128, L=64, dv=500) — "
                 "fused content-train path")
        args.train_samples, args.test_samples = saved

    out = os.path.join(REPO, "PARITY_RUN.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


# --------------------------------------------------------------------- #
def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen")
    g.add_argument("--root", required=True)
    g.add_argument("--preset", choices=sorted(PRESETS), default="charades")
    g.add_argument("--train-videos", type=int, default=250)
    g.add_argument("--test-videos", type=int, default=50)
    g.add_argument("--queries", type=int, default=8)
    g.add_argument("--signal", type=float, default=1.2)
    g.add_argument("--seed", type=int, default=43)
    g.add_argument("--epochs", type=int, default=10)
    g.add_argument("--smi-layers", type=int, default=3)
    g.set_defaults(fn=cmd_gen)

    e = sub.add_parser("export-init")
    e.add_argument("--config", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export_init)

    r = sub.add_parser("ref")
    r.add_argument("--config", required=True)
    r.add_argument("--init", default=None)
    r.add_argument("--out-dir", required=True)
    r.add_argument("--experiment", default="parity")
    r.add_argument("--epochs", type=int, default=None)
    r.add_argument("--seed", type=int, default=None)
    r.add_argument("--threads", type=int, default=1)
    r.set_defaults(fn=cmd_ref)

    o = sub.add_parser("ours")
    o.add_argument("--config", required=True)
    o.add_argument("--out-dir", default=None)
    o.add_argument("--epochs", type=int, default=None)
    o.add_argument("--seed", type=int, default=None)
    o.add_argument("--init", default=None)
    o.add_argument("--cpu", action="store_true")
    o.set_defaults(fn=cmd_ours)

    rep = sub.add_parser("report")
    rep.add_argument("--ref-dirs", nargs="+", required=True)
    rep.add_argument("--ours-dirs", nargs="+", required=True)
    rep.add_argument("--anet-ref-dirs", nargs="*", default=[])
    rep.add_argument("--anet-ours-dirs", nargs="*", default=[])
    rep.add_argument("--experiment", default="parity")
    rep.add_argument("--fixture", default="")
    rep.add_argument("--train-samples", type=int, default=0)
    rep.add_argument("--test-samples", type=int, default=0)
    rep.add_argument("--anet-train-samples", type=int, default=0)
    rep.add_argument("--anet-test-samples", type=int, default=0)
    rep.add_argument("--torch-version", default="2.13-cpu")
    rep.set_defaults(fn=cmd_report)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
