"""Experiment configuration.

Reads the exact YAML schema used by the reference configs
(/root/reference/config/charadessta.yml:1-25 — 20 keys covering model shape,
data location, and training hyperparameters) so the reference's config files
work unmodified, and validates them into a typed dataclass.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import yaml

# The exact key set of the reference YAML schema (reference config/*.yml).
REQUIRED_KEYS = (
    "model",
    "checkpoint_path",
    "resume_training",
    "T",
    "L",
    "C",
    "d",
    "input_video_dim",
    "dl",
    "max_query_length",
    "lstm_hidden_size",
    "num_smi_layers",
    "dataset",
    "data_dir",
    "batch_size",
    "num_workers",
    "seed",
    "optimizer",
    "lr",
    "num_epochs",
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static shape/hyperparameter config for the SMIN model.

    Frozen + hashable so it can be closed over by jitted functions.
    """

    T: int = 64                  # sampled clips per video
    L: int = 16                  # snippets; proposal map is L x L
    C: int = 4                   # sub-clips per moment
    D: int = 512                 # model feature dim ("d" in YAML)
    dl: int = 128                # content-word interaction dim
    num_smi_layers: int = 3
    input_video_dim: int = 1024
    max_query_length: int = 13
    lstm_hidden_size: int = 256
    word_dim: int = 300          # GloVe dimensionality
    # Compute policy (TPU): parameters stay fp32; activations may run bf16.
    compute_dtype: str = "float32"
    # Use the fused Pallas proposal kernel on TPU (XLA prefix-sum elsewhere;
    # only relevant in dense layout).
    use_pallas: bool = True
    # Triangular-packed moment layout: compute only the L(L+1)/2 valid
    # pairs through the SMI stack (~1.9x less compute/memory than dense).
    packed: bool = True
    # Rematerialize SMI blocks to bound activation memory at large L.
    remat_smi: bool = False
    # Experimental fused ContentUnit kernel (ops/content_pallas.py). Off by
    # default: measured slower than XLA's batched GEMMs at Charades scale.
    fused_content: bool = False
    # Fused SMI-stack serving kernel (ops/smin_pallas.py): run proposal +
    # all SMI layers + heads in one VMEM-resident Pallas kernel on the
    # grad-free (eval/serving) path. Auto-gated on TPU + VMEM feasibility.
    fused_smi: bool = True
    # Differentiable fused SMI stack on the TRAINING path
    # (ops/smin_train_pallas.py): per-layer Pallas kernels with in-VMEM
    # jax.vjp backward. Auto-gated on TPU + geometry feasibility.
    fused_smi_train: bool = True
    # Fused biLSTM serving kernel (ops/lstm_pallas.py): the whole 2-layer
    # bidirectional query recurrence in VMEM on the grad-free path.
    # Auto-gated on TPU + shape support (training keeps the XLA scan).
    fused_lstm: bool = True
    # Reference-compatibility head: densify pm to (B, L, L) and run dense
    # loss/metrics with dense labels — bit-reproducing the reference's
    # top-k-over-tied-zeros eval quirk (PARITY.md #16). Default off: the
    # packed pipeline never materializes an (B, L, L) map (scores, labels,
    # loss and metrics all live in the packed (B, N) layout).
    compat_head: bool = False

    def __post_init__(self):
        if self.T % self.L != 0:
            raise ValueError(f"T ({self.T}) must be a multiple of L ({self.L})")
        if self.D != 2 * self.lstm_hidden_size:
            # Hadamard fusion of video features with the biLSTM sentence
            # feature requires D == 2*hidden (reference models.py:81).
            raise ValueError(
                f"d ({self.D}) must equal 2*lstm_hidden_size "
                f"({2 * self.lstm_hidden_size}) for cross-modal fusion"
            )


@dataclasses.dataclass
class Config:
    """Full experiment config: model shape + data + training."""

    model: ModelConfig
    model_name: str = "SMIN"
    checkpoint_path: str = "checkpoints/"
    resume_training: bool = False
    dataset: str = "charadessta"
    data_dir: str = "data/charades"
    batch_size: int = 64
    num_workers: int = 4
    seed: int = 43
    optimizer: str = "Adam"
    lr: float = 5e-4
    num_epochs: int = 100
    experiment: str = "charadessta"
    # Extensions beyond the reference surface:
    nms: bool = False            # soft-NMS at eval (reference: "NOT IMPLEMENTED YET", utils.py:14)
    nms_sigma: float = 0.5
    num_devices: Optional[int] = None  # total devices (None = all)
    seq_devices: int = 1               # sequence-parallel width (2-D mesh when > 1)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    # Opt-in best-checkpoint tracking (the reference's TODO, main.py:269):
    # an eval metric name, e.g. "R@1, IoU=0.5"; saves {exp}_model_best.ckpt.
    save_best: Optional[str] = None
    # Evaluate every N epochs (the reference's open question, main.py:248;
    # 1 = reference behavior). Skipped epochs record no eval_* entries.
    eval_every: int = 1

    @property
    def raw(self) -> Dict[str, Any]:
        """Reference-schema dict view (the 20 YAML keys)."""
        m = self.model
        return {
            "model": self.model_name,
            "checkpoint_path": self.checkpoint_path,
            "resume_training": self.resume_training,
            "T": m.T,
            "L": m.L,
            "C": m.C,
            "d": m.D,
            "input_video_dim": m.input_video_dim,
            "dl": m.dl,
            "max_query_length": m.max_query_length,
            "lstm_hidden_size": m.lstm_hidden_size,
            "num_smi_layers": m.num_smi_layers,
            "dataset": self.dataset,
            "data_dir": self.data_dir,
            "batch_size": self.batch_size,
            "num_workers": self.num_workers,
            "seed": self.seed,
            "optimizer": self.optimizer,
            "lr": self.lr,
            "num_epochs": self.num_epochs,
        }


def config_from_dict(params: Dict[str, Any], experiment: str = "experiment") -> Config:
    """Build a Config from a reference-schema dict (validating key presence)."""
    missing = [k for k in REQUIRED_KEYS if k not in params]
    if missing:
        raise KeyError(f"config missing required keys: {missing}")
    # Only SMIN exists — same raise-on-unknown semantics (and error shape)
    # as reference main.py:68-75 get_model().
    if str(params["model"]) != "SMIN":
        raise ValueError(f'Model {params["model"]} is not a valid model!')
    model = ModelConfig(
        T=int(params["T"]),
        L=int(params["L"]),
        C=int(params["C"]),
        D=int(params["d"]),
        dl=int(params["dl"]),
        num_smi_layers=int(params["num_smi_layers"]),
        input_video_dim=int(params["input_video_dim"]),
        max_query_length=int(params["max_query_length"]),
        lstm_hidden_size=int(params["lstm_hidden_size"]),
        compute_dtype=str(params.get("compute_dtype", "float32")),
        use_pallas=bool(params.get("use_pallas", True)),
        packed=bool(params.get("packed", True)),
        remat_smi=bool(params.get("remat_smi", False)),
        fused_content=bool(params.get("fused_content", False)),
        fused_smi=bool(params.get("fused_smi", True)),
        fused_smi_train=bool(params.get("fused_smi_train", True)),
        fused_lstm=bool(params.get("fused_lstm", True)),
        compat_head=bool(params.get("compat_head", False)),
    )
    return Config(
        model=model,
        model_name=str(params["model"]),
        checkpoint_path=str(params["checkpoint_path"]),
        resume_training=bool(params["resume_training"]),
        dataset=str(params["dataset"]),
        data_dir=str(params["data_dir"]),
        batch_size=int(params["batch_size"]),
        num_workers=int(params["num_workers"]),
        seed=int(params["seed"]),
        optimizer=str(params["optimizer"]),
        lr=float(params["lr"]),
        num_epochs=int(params["num_epochs"]),
        experiment=experiment,
        nms=bool(params.get("nms", False)),
        nms_sigma=float(params.get("nms_sigma", 0.5)),
        seq_devices=int(params.get("seq_devices", 1)),
        save_best=params.get("save_best"),
        eval_every=int(params.get("eval_every", 1)),
    )


def load_config(config_path: str, num_epochs_override: int = 0) -> Config:
    """Load a YAML config file.

    Mirrors the reference CLI semantics (reference main.py:13-28): the
    experiment name is the config filename stem, and a nonzero
    ``num_epochs_override`` replaces the YAML value.
    """
    with open(config_path, "r") as f:
        params = yaml.load(f, Loader=yaml.SafeLoader)
    experiment = os.path.splitext(os.path.basename(config_path))[0]
    cfg = config_from_dict(params, experiment=experiment)
    if num_epochs_override != 0:
        cfg.num_epochs = int(num_epochs_override)
    return cfg
