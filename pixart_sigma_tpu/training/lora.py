"""LoRA / DoRA / rsLoRA as functional param-tree surgery.

Spec: /root/reference/train_scripts/train_pixart_lora_hf.py:505-524 — peft
LoRA on attention qkv/out, feed-forward, and the adaLN 'linear' (t_block),
with use_dora / use_rslora options.

JAX-functional design: no module wrapping. `init_lora_params` builds a small
trainable tree of (A, B[, m]) factors for every targeted kernel;
`apply_lora` materialises merged weights W + scale*(A@B) (or the DoRA
normalised form) for the forward pass — under jit this fuses into the
parameter load; `merge_lora` bakes factors in permanently for export.
Training optimises ONLY the LoRA tree (the base stays frozen), which with
optax means the optimizer state is rank-r sized.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (
    "qkv", "proj", "q_linear", "kv_linear", "fc1", "fc2", "t_block", "linear",
)


def _iter_kernels(tree: Dict[str, Any], prefix=()):  # yields (path, leaf)
    for key, val in tree.items():
        path = prefix + (key,)
        if isinstance(val, dict):
            if "kernel" in val and not isinstance(val["kernel"], dict):
                yield path, val["kernel"]
            yield from _iter_kernels(val, path)


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    out = dict(tree)
    node = out
    for p in path[:-1]:
        node[p] = dict(node[p])
        node = node[p]
    node[path[-1]] = value
    return out


def _targeted(path: Tuple[str, ...], targets: Sequence[str]) -> bool:
    # path ends with (..., <module>, 'kernel') is NOT included here; we get
    # the module path; target match on the module name
    return path[-1] in targets


def init_lora_params(
    params: Dict[str, Any],
    rank: int,
    rng: jax.Array,
    targets: Sequence[str] = DEFAULT_TARGETS,
    use_dora: bool = False,
) -> Dict[str, Any]:
    """{'<joined/path>': {'a': [in, r] normal, 'b': [r, out] zeros, 'm'?}}.

    Kernels may be stacked [L, in, out] (scan layout) — factors get a
    leading L too, giving per-layer adapters exactly like per-layer peft.
    """
    lora: Dict[str, Any] = {}
    for path, kernel in _iter_kernels(params):
        if not _targeted(path, targets):
            continue
        *lead, d_in, d_out = kernel.shape
        key = "/".join(path)
        rng, a_rng = jax.random.split(rng)
        entry = {
            "a": jax.random.normal(a_rng, (*lead, d_in, rank), jnp.float32)
            * (1.0 / rank),
            "b": jnp.zeros((*lead, rank, d_out), jnp.float32),
        }
        if use_dora:
            # column-norm magnitudes of the base weight
            entry["m"] = jnp.linalg.norm(kernel, axis=-2)
        lora[key] = entry
    return lora


def _delta(entry) -> jnp.ndarray:
    return jnp.einsum("...ir,...ro->...io", entry["a"], entry["b"])


def apply_lora(
    params: Dict[str, Any],
    lora: Dict[str, Any],
    scale: float = 1.0,
    rank: Optional[int] = None,
    use_rslora: bool = False,
    alpha: Optional[float] = None,
) -> Dict[str, Any]:
    """Merged params for the forward pass (pure; safe inside jit)."""
    if alpha is not None:
        r = rank or next(iter(lora.values()))["a"].shape[-1]
        scale = scale * (alpha / (r**0.5) if use_rslora else alpha / r)
    out = params
    for key, entry in lora.items():
        path = tuple(key.split("/"))
        kernel = _get(params, path)["kernel"]
        merged = kernel + scale * _delta(entry).astype(kernel.dtype)
        if "m" in entry:  # DoRA: renormalise columns then scale by learned m
            norm = jnp.linalg.norm(merged, axis=-2, keepdims=True)
            merged = entry["m"][..., None, :] * merged / jnp.maximum(norm, 1e-6)
        out = _set(out, path, dict(_get(params, path), kernel=merged))
    return out


def merge_lora(params, lora, **kwargs) -> Dict[str, Any]:
    """Permanently bake the adapters into the base weights (for export)."""
    return apply_lora(params, lora, **kwargs)


def count_lora_params(lora: Dict[str, Any]) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(lora))


def make_lora_train_step(
    model, diffusion, base_params, tx, scale: float = 1.0,
    snr_gamma: float | None = None,
):
    """train_step(lora, opt_state, batch, rng) optimising ONLY the adapters.

    `snr_gamma` enables Min-SNR-gamma MSE rebalancing, matching the
    reference LoRA trainer's --snr_gamma
    (train_pixart_lora_hf.py:252,864-875; recommended 5.0)."""
    import optax

    def loss_fn(lora, batch, t, noise, drop_rng):
        merged = apply_lora(base_params, lora, scale=scale)

        def model_fn(x_t, t_in):
            return model.apply(
                {"params": merged}, x_t, t_in, batch["y"], batch.get("y_mask"),
                train=True, rngs={"caption_drop": drop_rng},
            )

        mse_weight = (
            diffusion.min_snr_weight(t, snr_gamma)
            if snr_gamma is not None else None
        )
        terms = diffusion.training_losses(
            model_fn, batch["latents"], t, noise=noise, mse_weight=mse_weight
        )
        return jnp.mean(terms["loss"])

    @jax.jit
    def train_step(lora, opt_state, batch, rng):
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        B = batch["latents"].shape[0]
        t = jax.random.randint(t_rng, (B,), 0, diffusion.num_timesteps)
        noise = jax.random.normal(n_rng, batch["latents"].shape)
        loss, grads = jax.value_and_grad(loss_fn)(lora, batch, t, noise, d_rng)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step
