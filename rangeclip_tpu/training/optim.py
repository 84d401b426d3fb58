"""Optimizer + learning-rate schedules.

Reference: train_util.py:493-544 — Adam(lr, weight_decay) with one of
  * MultiStepLR(milestones=learning_schedule, gamma=0.1) — note the
    reference quirk: the extra entries of ``learning_rates`` are NEVER used
    by this scheduler, only lr[0] * 0.1^k;
  * CosineAnnealingLR(T_max=last epoch, eta_min=learning_rates[-1]);
  * ReduceLROnPlateau(mode=min, factor=0.1, patience=5,
    min_lr=learning_rates[-1]).

torch Adam's ``weight_decay`` is L2-added-to-gradient (NOT AdamW); we
replicate with add_decayed_weights BEFORE scale_by_adam, applied to every
parameter (torch decays all params including norm scales and the
temperatures).

All schedulers are stepped per EPOCH (train_util.py:409) and produce a
plain float learning rate that the train step receives as a traced scalar —
changing the lr never recompiles.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import optax


def make_optimizer(
    weight_decay: float = 0.0, freeze_encoder: bool = False
) -> optax.GradientTransformation:
    """Adam with torch-style L2 weight decay; the learning rate is applied
    by the train step (updates are the raw Adam direction, sign-flipped).

    ``freeze_encoder=True`` zeroes every update on the ``depth_encoder``
    parameter subtree (the frozen-encoder finetune the reference requests
    via train_util.py:158 restore(..., freeze_encoder=True)); the model
    side of the freeze is eval-mode encoder BN
    (DepthUNetConfig.freeze_encoder)."""
    txs = []
    if weight_decay > 0.0:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    txs.append(optax.scale(-1.0))
    tx = optax.chain(*txs)
    if freeze_encoder:
        def labels(params):
            return {
                k: jax.tree.map(
                    lambda _: "frozen" if k == "depth_encoder" else "train", v
                )
                for k, v in params.items()
            }
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


class MultiStepSchedule:
    """lr = lr0 * gamma^{#milestones passed} (torch MultiStepLR)."""

    def __init__(self, lr0: float, milestones: Sequence[int], gamma: float = 0.1):
        self.lr0 = lr0
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        k = sum(1 for m in self.milestones if epoch >= m)
        return self.lr0 * (self.gamma**k)

    def step_metric(self, metric: float) -> None:  # uniform interface
        pass


class CosineAnnealingSchedule:
    """lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi e / T_max)) / 2."""

    def __init__(self, lr0: float, t_max: int, eta_min: float = 0.0):
        self.lr0 = lr0
        self.t_max = t_max
        self.eta_min = eta_min

    def __call__(self, epoch: int) -> float:
        return self.eta_min + (self.lr0 - self.eta_min) * (
            1 + math.cos(math.pi * epoch / self.t_max)
        ) / 2

    def step_metric(self, metric: float) -> None:
        pass


class ReduceOnPlateauSchedule:
    """torch ReduceLROnPlateau(mode=min, factor, patience, min_lr).

    Call ``step_metric(val_loss)`` once per epoch, then ``__call__`` for the
    current lr.
    """

    def __init__(self, lr0: float, factor: float = 0.1, patience: int = 5,
                 min_lr: float = 0.0):
        self.lr = lr0
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0

    def __call__(self, epoch: int) -> float:
        return self.lr

    def step_metric(self, metric: float) -> None:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0


def make_lr_schedule(
    scheduler_type: str,
    learning_rates: Sequence[float],
    learning_schedule: Sequence[int],
):
    if scheduler_type == "multi_step":
        return MultiStepSchedule(learning_rates[0], learning_schedule, gamma=0.1)
    elif scheduler_type == "cosine_annealing":
        return CosineAnnealingSchedule(
            learning_rates[0], learning_schedule[-1], eta_min=learning_rates[-1]
        )
    elif scheduler_type == "reduce_on_plateau":
        return ReduceOnPlateauSchedule(
            learning_rates[0], factor=0.1, patience=5, min_lr=learning_rates[-1]
        )
    else:
        raise ValueError(f"Unsupported scheduler type: {scheduler_type}")
