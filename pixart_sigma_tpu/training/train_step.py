"""The jitted, mesh-sharded iDDPM training step.

Spec: the hot loop of /root/reference/train_scripts/train.py:137-207 —
sample t ~ U[0, T), q_sample, model forward, MSE+VLB loss, grad clip 0.01,
optimizer step, EMA. TPU-first: the whole step (including CFG caption drop
and EMA) is ONE jitted program; gradient all-reduce over the mesh's data/fsdp
axes is emitted by GSPMD from the sharding annotations — there is no
hand-written collective here.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pixart_sigma_tpu.diffusion.gaussian import GaussianDiffusion
from pixart_sigma_tpu.parallel.mesh import data_sharding, param_sharding
from pixart_sigma_tpu.training.train_state import TrainState


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    *,
    mesh: Optional[Mesh] = None,
    fsdp: bool = False,
    tensor: bool = False,
    donate: bool = True,
    schedule_sampler=None,
    snr_gamma: Optional[float] = None,
    mask_loss_coef: float = 0.0,
    fsdp_min_size: int = 2**16,
) -> Callable:
    """Build train_step(state, batch, rng) -> (state, metrics).

    batch dict (all [B, ...], B sharded over the mesh batch axes):
      latents [B, H, W, C], y [B, L, 4096], y_mask [B, L],
      optional img_hw [B, 2], aspect_ratio [B, 1]

    `schedule_sampler`: optional LossSecondMomentResampler INITIAL state; when
    given, the importance-sampler state rides inside TrainState-like tuple —
    the trainer passes/receives it as part of the (state, sampler) pair.
    `snr_gamma`: Min-SNR-gamma MSE rebalancing (reference
    train_pixart_lora_hf.py:864-875; recommended 5.0, None = off).
    `mask_loss_coef`: removed-patch loss weight when the model is built with
    mask_ratio > 0 (reference gaussian_diffusion.py:836-849).
    """
    masked = getattr(model.cfg, "mask_ratio", 0.0) > 0

    def loss_fn(params, batch, t, noise, drop_rng, mask_rng):
        def model_fn(x_t, t_in):
            rngs = {"caption_drop": drop_rng}
            if masked:
                rngs["mask"] = mask_rng
            return model.apply(
                {"params": params},
                x_t,
                t_in,
                batch["y"],
                batch.get("y_mask"),
                batch.get("img_hw"),
                batch.get("aspect_ratio"),
                train=True,
                rngs=rngs,
            )

        mse_weight = (
            diffusion.min_snr_weight(t, snr_gamma)
            if snr_gamma is not None else None
        )
        terms = diffusion.training_losses(
            model_fn, batch["latents"], t, noise=noise,
            mse_weight=mse_weight, mask_loss_coef=mask_loss_coef,
            patch_size=model.cfg.patch_size,
        )
        loss = jnp.mean(terms["loss"])
        metrics = {"loss": loss, "mse": jnp.mean(terms["mse"])}
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"])
        if "mae" in terms:
            metrics["mae"] = jnp.mean(terms["mae"])
        return loss, (metrics, terms["loss"])

    use_resampler = schedule_sampler is not None

    def train_step(state: TrainState, batch, rng, sampler=None):
        rng = jax.random.fold_in(rng, state.step)
        t_rng, noise_rng, drop_rng, mask_rng = jax.random.split(rng, 4)
        B = batch["latents"].shape[0]
        if use_resampler:
            t, loss_weight = sampler.sample(t_rng, B)
        else:
            t = jax.random.randint(t_rng, (B,), 0, diffusion.num_timesteps)
            loss_weight = None
        noise = jax.random.normal(
            noise_rng, batch["latents"].shape, batch["latents"].dtype
        )

        def weighted_loss(params):
            loss, (metrics, per_sample) = loss_fn(
                params, batch, t, noise, drop_rng, mask_rng
            )
            if loss_weight is not None:
                loss = jnp.mean(per_sample * loss_weight)
                metrics = dict(metrics, loss=loss)
            return loss, (metrics, per_sample)

        (_, (metrics, per_sample)), grads = jax.value_and_grad(
            weighted_loss, has_aux=True
        )(state.params)
        metrics["grad_norm"] = optax_global_norm(grads)
        new_state = state.apply_gradients(grads)
        if use_resampler:
            sampler = sampler.update(t, per_sample)
            return new_state, metrics, sampler
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    batch_shard = data_sharding(mesh)

    def shard_state(state_shape):
        """Sharding tree for the TrainState (params/opt/ema: fsdp/tp rules)."""
        def leaf(x):
            return param_sharding(
                x, mesh, fsdp=fsdp, tensor=tensor, min_size=fsdp_min_size
            )

        return TrainState(
            step=repl,
            params=leaf(state_shape.params),
            opt_state=leaf(state_shape.opt_state),
            ema_params=(
                leaf(state_shape.ema_params)
                if state_shape.ema_params is not None
                else None
            ),
            tx=state_shape.tx,
            ema_rate=state_shape.ema_rate,
        )

    cache: dict[Any, Callable] = {}
    # sequence parallelism: the model's seq_constraint annotations read the
    # AMBIENT mesh at trace time, so trace/execute under jax.set_mesh when
    # the mesh carries a real seq axis (no-op context otherwise)
    seq_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("seq", 1)

    def _mesh_ctx():
        import contextlib

        return jax.set_mesh(mesh) if seq_size > 1 else contextlib.nullcontext()

    def jitted(state, batch, rng, sampler=None):
        # one compiled program per batch-shape signature (aspect-ratio bucket)
        key = tuple(sorted((k, v.shape) for k, v in batch.items()))
        if key not in cache:
            state_sh = shard_state(state)
            batch_sh = {k: batch_shard for k in batch}
            if use_resampler:
                sampler_sh = jax.tree_util.tree_map(lambda _: repl, sampler)
                cache[key] = jax.jit(
                    train_step,
                    in_shardings=(state_sh, batch_sh, repl, sampler_sh),
                    out_shardings=(state_sh, repl, sampler_sh),
                    donate_argnums=(0, 3) if donate else (),
                )
            else:
                cache[key] = jax.jit(
                    train_step,
                    in_shardings=(state_sh, batch_sh, repl),
                    out_shardings=(state_sh, repl),
                    donate_argnums=(0,) if donate else (),
                )
        with _mesh_ctx():
            if use_resampler:
                return cache[key](state, batch, rng, sampler)
            return cache[key](state, batch, rng)

    # exposed for HLO/sharding inspection (tests assert the compiled step
    # contains the expected fsdp collectives and no full weight replication)
    jitted.cache = cache
    jitted.cache_key = lambda batch: tuple(
        sorted((k, v.shape) for k, v in batch.items())
    )
    return jitted


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
