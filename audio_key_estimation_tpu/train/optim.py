"""Optimizer: Adam + per-epoch exponential LR decay (models.py:1017-1027).

torch.optim.Adam(weight_decay=reg) applies L2 *into the gradient* before the
moment updates (not decoupled AdamW) — reproduced with add_decayed_weights
ahead of adam. ExponentialLR(gamma) steps once per EPOCH; the optax schedule
uses staircase exponential decay keyed on the optimizer step count with
`steps_per_epoch` transitions.
"""

from __future__ import annotations

import optax

from ..config import Config


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.gamma,
        staircase=True)
    parts = []
    if cfg.reg:
        parts.append(optax.add_decayed_weights(cfg.reg))
    parts.append(optax.adam(learning_rate=schedule, b1=0.9, b2=0.999))
    return optax.chain(*parts)
