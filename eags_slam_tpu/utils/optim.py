"""Masked Adam with per-leaf learning rates and slot-reset.

Why not optax directly: the SLAM map is a fixed-capacity array with an
alive-mask; the reference concatenates new points into torch.optim state with
zeroed moments (gaussian_model.py:535-583) and prunes rows out of it
(:501-533). With static shapes both become O(1) masked updates on the moment
pytrees: `reset_slots` zeroes moments at newly-seeded rows, dead rows simply
receive zero gradients. Also provides the amsgrad variant used for camera pose
optimization (gaussian_model.py:364-383) and the exponential xyz LR schedule
(gaussian_model_utils.py:133-166).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray  # () int32
    mu: Any            # pytree like params
    nu: Any
    vmax: Any          # amsgrad max-nu, or None-like zeros when disabled


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(jnp.zeros((), jnp.int32), zeros,
                     jax.tree.map(jnp.zeros_like, params), zeros)


def adam_update(
    state: AdamState,
    params,
    grads,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    amsgrad: bool = False,
):
    """One Adam step. `lr_tree` is a pytree of scalars (or a single scalar)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    if amsgrad:
        vmax = jax.tree.map(jnp.maximum, state.vmax, nu)
        denom_src = vmax
    else:
        vmax = state.vmax
        denom_src = nu

    if not isinstance(lr_tree, (dict, list, tuple)) and not hasattr(
        lr_tree, "_fields"
    ):
        lr_tree = jax.tree.map(lambda _: lr_tree, params)

    new_params = jax.tree.map(
        lambda p, m, v, lr: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, mu, denom_src, lr_tree,
    )
    return new_params, AdamState(step, mu, nu, vmax)


def reset_slots(state: AdamState, idx: jnp.ndarray, valid: jnp.ndarray) -> AdamState:
    """Zero first-axis rows `idx` (where valid) of all moment trees."""

    def zero_rows(x):
        # Out-of-range sentinel + mode='drop' makes invalid rows a no-op.
        dest = jnp.where(valid, idx, x.shape[0])
        upd = jnp.zeros((idx.shape[0],) + x.shape[1:], x.dtype)
        return x.at[dest].set(upd, mode="drop")

    return AdamState(
        state.step,
        jax.tree.map(zero_rows, state.mu),
        jax.tree.map(zero_rows, state.nu),
        jax.tree.map(zero_rows, state.vmax),
    )


def exp_lr_schedule(step, lr_init: float, lr_final: float, max_steps: int,
                    delay_mult: float = 0.01, delay_steps: int = 0):
    """3DGS log-linear interp schedule (gaussian_model_utils.py:133-166)."""
    t = jnp.clip(step.astype(jnp.float32) / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if delay_steps > 0:
        delay_rate = delay_mult + (1 - delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp


class PlateauState(NamedTuple):
    """ReduceLROnPlateau carried inside lax loops (tracker/solver use it).

    Mirrors torch.optim.lr_scheduler.ReduceLROnPlateau(patience, factor)
    as configured at gaussian_model.py:376-383.
    """

    lr_scale: jnp.ndarray  # () f32 multiplicative factor
    best: jnp.ndarray      # () f32 best loss seen
    bad_count: jnp.ndarray  # () int32


def plateau_init() -> PlateauState:
    return PlateauState(jnp.ones(()), jnp.full((), jnp.inf), jnp.zeros((), jnp.int32))


def plateau_update(state: PlateauState, loss, patience: int = 5,
                   factor: float = 0.5, min_scale: float = 1e-3) -> PlateauState:
    improved = loss < state.best
    bad = jnp.where(improved, 0, state.bad_count + 1)
    trigger = bad > patience
    scale = jnp.where(trigger, jnp.maximum(state.lr_scale * factor, min_scale),
                      state.lr_scale)
    return PlateauState(scale, jnp.minimum(state.best, loss),
                        jnp.where(trigger, 0, bad))
