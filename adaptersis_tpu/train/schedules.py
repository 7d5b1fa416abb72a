"""LR schedules (reference: torch CosineAnnealingLR in train.py:192,
utils.py:187-198 cosine_scheduler, dinov2/utils/utils.py:67-89 CosineScheduler)."""

from __future__ import annotations

import numpy as np


def cosine_annealing(base_lr: float, total_epochs: int, eta_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR stepped per epoch
    (train.py:192,232): lr(e) = eta_min + (base-eta_min)(1+cos(pi e/T))/2."""

    def lr(epoch: int) -> float:
        return eta_min + (base_lr - eta_min) * (1 + np.cos(np.pi * epoch / total_epochs)) / 2

    return lr


def cosine_scheduler(base_value: float, final_value: float, epochs: int,
                     niter_per_ep: int, warmup_epochs: int = 0,
                     start_warmup_value: float = 0.0, freeze_iters: int = 0) -> np.ndarray:
    """Per-iteration cosine array with linear warmup + freeze prefix
    (utils.py:187-198 + dinov2 CosineScheduler freeze_iters)."""
    total = epochs * niter_per_ep
    freeze_iters = min(freeze_iters, total)
    warmup_iters = min(warmup_epochs * niter_per_ep, total - freeze_iters)
    freeze = np.zeros(freeze_iters)
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters) if warmup_iters else np.array([])
    n_cos = total - warmup_iters - freeze_iters
    iters = np.arange(n_cos)
    cos = (final_value + 0.5 * (base_value - final_value)
           * (1 + np.cos(np.pi * iters / max(n_cos, 1))))
    out = np.concatenate([freeze, warmup, cos])
    assert len(out) == total
    return out
