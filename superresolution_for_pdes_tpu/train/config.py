"""Training configuration.

Defaults replicate the published run configuration
(``/root/reference/src/train_enhanced.py:192-205`` and
``results/enhanced_run_20250227_142049/config.json``): batch 32, <=500 epochs,
AdamW lr 2e-4 / weight decay 1e-4, plateau LR (factor 0.5, patience 10,
min 1e-6), early stopping 20, val split 0.2, grad clip 1.0, stratified split.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 32
    num_epochs: int = 500
    learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    min_lr: float = 1e-6
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    early_stopping_patience: int = 20
    val_split: float = 0.2
    grad_clip: float = 1.0
    seed: int = 42
    stratify_by_subdomain: bool = True
    model: str = "attention_unet"  # see models.registry.available_models()
    normalization: str = "dataset"  # "dataset" (reference parity) or "per_sample"
    # Scale-aware self-normalization: append log(u_std)/log(f_std) input
    # channels (in_channels=5) so per-sample/per-tile normalization stops
    # destroying amplitude information. Pair with normalization="per_sample";
    # at cascade inference use stats_mode="tile".
    scale_channels: bool = False
    # Normalization layer: "batch" (reference parity) or "group" (no
    # train/eval statistics mismatch; no cross-replica reductions under DP).
    model_norm: str = "batch"
    # TPU-native extensions (not in the reference):
    physics_weight: float = 0.0  # weight of the PDE-residual loss (README.md:152)
    coarse_noise_std: float = 0.0  # train-time noise on the coarse input channel
    dtype: str = "float32"  # compute dtype for the model ("bfloat16" supported)
    mesh_shape: Optional[int] = None  # data-parallel device count (None = all)
    log_tensorboard: bool = False
    checkpoint_every_best: bool = True
    # Host checkpoint writes move the full train state off-device (expensive
    # over remote-TPU tunnels); the best state is tracked as a free on-device
    # reference and persisted only every `checkpoint_interval` improvements
    # plus once at the end. 1 = write on every improvement.
    checkpoint_interval: int = 25
    # Fused streaming: scan this many epochs (regenerate -> train -> validate)
    # inside ONE device program, eliminating the per-epoch host dispatches and
    # tunnel round-trips of streamed training. 0/1 = the standard loop.
    # Requires a dataset_generator; LR-plateau changes apply at chunk
    # boundaries and the best checkpoint stores the state at the end of the
    # chunk containing the best epoch.
    fused_epochs: int = 0
    # Streamed-regen cadence: regenerate the on-device training set every
    # `gen_every` epochs instead of every epoch (batches are reshuffled every
    # epoch either way). The champion epoch is regen-bound, not step-bound
    # (reports/train_bench.json: regen 3.4 s vs scan 2.8 s vs val 0.2 s), so
    # 2-3 cuts wall-clock ~30-40% while the model still sees a fresh set
    # every K epochs. 1 = the (byte-identical) original streaming behavior.
    gen_every: int = 1

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(dataclasses.asdict(self), indent=4))

    @classmethod
    def from_json(cls, path: str | Path) -> "TrainConfig":
        return cls(**json.loads(Path(path).read_text()))
