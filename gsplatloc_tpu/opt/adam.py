"""torch-parity Adam with decoupled-per-parameter lr / weight decay.

The reference uses one torch.optim.Adam per parameter (quat lr 5e-4, trans
lr 1e-3, weight_decay 1e-3 both; src/my_gsplat/model.py:18-23,93-116) with
ExponentialLR gamma = 0.2^(1/max_steps) stepped once per iteration
(gs_trainer_total.py:65-72). torch Adam semantics reproduced exactly:
L2 weight decay folded into the gradient (NOT AdamW), bias-corrected moments,
eps added after the vhat sqrt.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray


def adam_init(param: jnp.ndarray) -> AdamState:
    return AdamState(m=jnp.zeros_like(param), v=jnp.zeros_like(param))


def adam_step(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    state: AdamState,
    step: jnp.ndarray,  # 0-based iteration index
    lr: jnp.ndarray,  # already-decayed learning rate for this step
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
):
    """One torch.optim.Adam step. Returns (new_param, new_state)."""
    g = grad + weight_decay * param
    m = beta1 * state.m + (1.0 - beta1) * g
    v = beta2 * state.v + (1.0 - beta2) * g * g
    t = (step + 1).astype(param.dtype)
    mhat = m / (1.0 - beta1**t)
    vhat = v / (1.0 - beta2**t)
    new_param = param - lr * mhat / (jnp.sqrt(vhat) + eps)
    return new_param, AdamState(m=m, v=v)


def exponential_lr(base_lr: float, gamma: float, step: jnp.ndarray) -> jnp.ndarray:
    """torch ExponentialLR: lr at iteration `step` (0-based) = base * gamma^step."""
    return base_lr * gamma**step.astype(jnp.float32)
