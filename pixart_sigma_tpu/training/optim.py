"""Optimizers as optax transforms: CAME (Sigma default), Lion, AdamW.

Spec: /root/reference/diffusion/utils/optimizer.py — CAMEWrapper :242-246
(wrapping the external came_pytorch.CAME), Lion :174-239, auto_scale_lr
:18-28. CAME here is implemented from the published algorithm (Luo et al.
2023, "CAME: Confidence-guided Adaptive Memory Efficient Optimization"):
Adafactor-style factored second moments plus a confidence-guided
(residual-factored) rescale of the momentum update. Memory per matrix param
is O(n+m) for both second-moment and confidence stats + one full momentum.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax


def _factored(shape: tuple[int, ...]) -> bool:
    return len(shape) >= 2


def _rms(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def _approx_sq_grad(row: jnp.ndarray, col: jnp.ndarray) -> jnp.ndarray:
    """Adafactor rank-1 reconstruction: rsqrt(R/mean(R)) ⊗ rsqrt(C)."""
    r = jax.lax.rsqrt(row / jnp.mean(row, axis=-1, keepdims=True))[..., None]
    c = jax.lax.rsqrt(col)[..., None, :]
    return r * c


class CameState(NamedTuple):
    count: chex.Array
    exp_avg: Any  # momentum (full shape)
    row: Any  # factored 2nd moment rows / full 2nd moment for vectors
    col: Any  # factored 2nd moment cols / empty for vectors
    res_row: Any  # confidence rows
    res_col: Any  # confidence cols


def came(
    learning_rate: optax.ScalarOrSchedule,
    betas: Tuple[float, float, float] = (0.9, 0.999, 0.9999),
    eps: Tuple[float, float] = (1e-30, 1e-16),
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
    decay_mask=None,
) -> optax.GradientTransformation:
    """CAME optimizer (the Sigma configs' default: lr 2e-5, wd 0).

    `decay_mask`: optional callable params -> pytree[bool] (True = apply
    weight decay); mirrors the reference's per-module `zero_weight_decay`
    param groups (optimizer.py:138-148).
    """
    beta1, beta2, beta3 = betas
    eps1, eps2 = eps

    def init_fn(params):
        def zeros_like_stats(p):
            if _factored(p.shape):
                return (
                    jnp.zeros(p.shape[:-1], p.dtype),  # row: mean over last dim
                    jnp.zeros(p.shape[:-2] + p.shape[-1:], p.dtype),  # col
                )
            # (1,) placeholder, not (0,): orbax cannot serialise empty arrays
            return (jnp.zeros_like(p), jnp.zeros((1,), p.dtype))

        stats = jax.tree_util.tree_map(zeros_like_stats, params)
        row = jax.tree_util.tree_map(lambda s: s[0], stats, is_leaf=lambda x: isinstance(x, tuple))
        col = jax.tree_util.tree_map(lambda s: s[1], stats, is_leaf=lambda x: isinstance(x, tuple))
        return CameState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree_util.tree_map(jnp.zeros_like, params),
            row=row,
            col=col,
            res_row=jax.tree_util.tree_map(jnp.zeros_like, row),
            res_col=jax.tree_util.tree_map(jnp.zeros_like, col),
        )

    def update_fn(grads, state, params):
        assert params is not None, "came requires params (for weight decay)"
        count = state.count + 1
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else learning_rate
        )

        def one(g, p, m, r, c, sr, sc, dm=True):
            g = g.astype(jnp.float32)
            sq = jnp.square(g) + eps1
            if _factored(g.shape):
                r = beta2 * r + (1 - beta2) * jnp.mean(sq, axis=-1)
                c = beta2 * c + (1 - beta2) * jnp.mean(sq, axis=-2)
                u = _approx_sq_grad(r, c) * g
            else:
                r = beta2 * r + (1 - beta2) * sq
                u = g * jax.lax.rsqrt(r)
            u = u / jnp.maximum(1.0, _rms(u) / clip_threshold)
            m = beta1 * m + (1 - beta1) * u
            if _factored(g.shape):
                res = jnp.square(u - m) + eps2
                sr = beta3 * sr + (1 - beta3) * jnp.mean(res, axis=-1)
                sc = beta3 * sc + (1 - beta3) * jnp.mean(res, axis=-2)
                upd = _approx_sq_grad(sr, sc) * m
            else:
                upd = m
            delta = -lr * upd
            if weight_decay:
                decayed = delta - lr * weight_decay * p.astype(jnp.float32)
                delta = decayed if dm is True else jnp.where(dm, decayed, delta)
            return delta.astype(p.dtype), m, r, c, sr, sc

        args = [
            grads, params, state.exp_avg, state.row, state.col,
            state.res_row, state.res_col,
        ]
        if weight_decay and decay_mask is not None:
            mask = decay_mask(params) if callable(decay_mask) else decay_mask
            args.append(mask)
        flat_out = jax.tree_util.tree_map(one, *args)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], flat_out, is_leaf=lambda x: isinstance(x, tuple)
        )
        updates = pick(0)
        new_state = CameState(
            count=count, exp_avg=pick(1), row=pick(2), col=pick(3),
            res_row=pick(4), res_col=pick(5),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def lion(
    learning_rate: optax.ScalarOrSchedule,
    betas: Tuple[float, float] = (0.9, 0.99),
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Lion (sign-momentum) optimizer, spec optimizer.py:174-239."""
    return optax.lion(
        learning_rate, b1=betas[0], b2=betas[1], weight_decay=weight_decay
    )


def auto_scale_lr(
    lr: float, effective_bs: int, rule: str = "linear", base_batch_size: int = 256
) -> tuple[float, float]:
    """Linear/sqrt LR scaling (optimizer.py:18-28); returns (lr, ratio)."""
    assert rule in ("linear", "sqrt")
    ratio = (
        effective_bs / base_batch_size
        if rule == "linear"
        else math.sqrt(effective_bs / base_batch_size)
    )
    return lr * ratio, ratio


def build_optimizer(
    *,
    name: str = "came",
    learning_rate: optax.ScalarOrSchedule,
    weight_decay: float = 0.0,
    betas=None,
    eps=None,
    grad_clip_norm: Optional[float] = None,
    skip_decay_fn=None,
) -> optax.GradientTransformation:
    """Build the optimizer chain: [global-norm clip] -> optimizer.

    Matches the reference's defaults: CAME(lr 2e-5, betas (0.9,0.999,0.9999),
    eps (1e-30,1e-16)) with gradient_clip 0.01 for Sigma configs.

    `skip_decay_fn(path: tuple[str, ...], param) -> bool` marks params that
    must NOT receive weight decay — the JAX answer to the reference's
    param-wise `zero_weight_decay` groups (optimizer.py:31-148). `path` is
    the tuple of pytree key names (e.g. ('blocks', 'attn', 'qkv', 'bias')).
    """
    decay_mask = None
    if skip_decay_fn is not None:

        def _key_name(k):
            for attr in ("key", "name", "idx"):
                if hasattr(k, attr):
                    return getattr(k, attr)
            return k

        def decay_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, p: not skip_decay_fn(
                    tuple(_key_name(k) for k in path), p
                ),
                params,
            )

    if name == "came":
        # eps may leak in as a scalar from a merged AdamW base config; CAME
        # needs its (eps1, eps2) pair — fall back to the paper defaults then
        eps_pair = (
            tuple(eps) if isinstance(eps, (tuple, list)) else (1e-30, 1e-16)
        )
        opt = came(
            learning_rate,
            betas=tuple(betas) if betas else (0.9, 0.999, 0.9999),
            eps=eps_pair,
            weight_decay=weight_decay,
            decay_mask=decay_mask,
        )
    elif name == "lion":
        opt = optax.lion(
            learning_rate,
            b1=betas[0] if betas else 0.9,
            b2=betas[1] if betas else 0.99,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    elif name == "adamw":
        opt = optax.adamw(
            learning_rate,
            b1=betas[0] if betas else 0.9,
            b2=betas[1] if betas else 0.999,
            eps=eps if isinstance(eps, float) else 1e-10,
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    else:
        raise ValueError(f"unknown optimizer {name}")
    if grad_clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    return opt
