#!/usr/bin/env python
"""Training-step throughput bench on the real TPU (remat / batch sweep).

Round-3 VERDICT weak #3: the 1024px training step used blanket per-block
remat ("nothing saved") without ever profiling alternatives. This sweeps
jax.checkpoint policies (and batch size at the best policy) for the
production operating points:

  --op 256       256px B=64 (PixArt_sigma_xl2_img256 config point)
  --op 1024kv    1024px kv-compress B=4 (the Sigma production config)
  --op 2k        2K kv-compress B=1

Measurement pattern per CLAUDE.md: K train steps inside ONE jitted
lax.scan (the tunneled backend's only sound completion barrier is a
device_get of a scalar), timed on the 2nd call (1st compiles).

Usage:
  python scripts/bench_train.py --op 1024kv --policies nothing,dots,dots_no_batch
  python scripts/bench_train.py --op 1024kv --policy dots --batches 4,6,8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


OPS = {
    "256": dict(image_size=256, batch=64, kv=False, steps=8),
    "1024": dict(image_size=1024, batch=4, kv=False, steps=8),
    "1024kv": dict(image_size=1024, batch=4, kv=True, steps=8),
    "2k": dict(image_size=2048, batch=1, kv=True, steps=4),
}


def build(op, policy, batch, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.diffusion import IDDPM
    from pixart_sigma_tpu.models.pixart import PixArtConfig, PixArt

    size = op["image_size"]
    kv = dict(
        kv_compress_sampling="conv", kv_compress_scale=2,
        kv_compress_layers=tuple(range(14, 28)),
    ) if op["kv"] else {}
    cfg = PixArtConfig(
        input_size=size // 8,
        model_max_length=300,
        pe_interpolation=size / 512.0,
        micro_condition=False,
        qk_norm=False,  # production kvcompress configs ship qk_norm=False
        dtype=jnp.bfloat16,
        grad_checkpointing=True,
        remat_policy=policy,
        # MAE-style masked-token training (--mask-ratio; reference
        # model/utils.py:192-307): blocks only see the kept token subset,
        # cutting block FLOPs ~(1 - ratio). Incompatible with kv-compress.
        mask_ratio=getattr(args, "mask_ratio", 0.0),
        mask_type="random",
        **kv,
    )
    model = PixArt(cfg)
    diffusion = IDDPM(timestep_respacing=[1000], learn_sigma=True,
                      rescale_learned_sigmas=True)
    B, L = batch, 300
    h = size // 8
    rng = np.random.RandomState(0)
    batch_d = {
        "latents": jnp.asarray(rng.randn(B, h, h, 4).astype(np.float32)),
        "y": jnp.asarray(rng.randn(B, L, 4096).astype(np.float32) * 0.02),
        "y_mask": jnp.ones((B, L), dtype=jnp.int32),
    }
    return model, diffusion, cfg, batch_d


def bench_one(op, policy, batch, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.training import (
        TrainState, build_lr_schedule, build_optimizer,
    )
    from pixart_sigma_tpu.training.train_step import optax_global_norm

    model, diffusion, cfg, batch_d = build(op, policy, batch, args)
    B = batch
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "caption_drop": jax.random.PRNGKey(1)},
        jnp.zeros_like(batch_d["latents"]), jnp.zeros((B,)),
        jnp.zeros_like(batch_d["y"]), batch_d["y_mask"], train=True,
    )["params"])()
    tx = build_optimizer(
        name="came",
        learning_rate=build_lr_schedule("constant", 2e-5, num_warmup_steps=0),
        grad_clip_norm=0.01,
    )
    state = TrainState.create(params=params, tx=tx, ema=True)
    K = op["steps"] if args.steps is None else args.steps

    # batch rides as a jit ARGUMENT — closing over it would bake up to
    # hundreds of MB of caption constants into the program (CLAUDE.md
    # gotcha; the serialized payload then trips the remote compiler)
    def one_step(state, batch_d, rng):
        rng = jax.random.fold_in(rng, state.step)
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)[:3]
        t = jax.random.randint(t_rng, (B,), 0, diffusion.num_timesteps)
        noise = jax.random.normal(n_rng, batch_d["latents"].shape)

        masked = getattr(args, "mask_ratio", 0.0) > 0
        m_rng = jax.random.fold_in(d_rng, 1)

        def loss_fn(p):
            def model_fn(x_t, t_in):
                rngs = {"caption_drop": d_rng}
                if masked:
                    rngs["mask"] = m_rng
                return model.apply(
                    {"params": p}, x_t, t_in, batch_d["y"],
                    batch_d["y_mask"], train=True,
                    rngs=rngs,
                )

            terms = diffusion.training_losses(
                model_fn, batch_d["latents"], t, noise=noise,
                mask_loss_coef=0.1 if masked else 0.0,
                patch_size=cfg.patch_size,
            )
            return jnp.mean(terms["loss"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def multi_step(state, batch_arg, rng):
        def body(carry, i):
            st, _ = carry
            st, loss = one_step(st, batch_arg, jax.random.fold_in(rng, i))
            return (st, loss), None

        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), jnp.arange(K)
        )
        return st, loss

    donate = jax.jit(multi_step, donate_argnums=(0,))
    # compile + 1 warm run
    t0 = time.time()
    state, loss = donate(state, batch_d, jax.random.PRNGKey(0))
    loss = float(jax.device_get(loss))
    t_compile = time.time() - t0
    # timed run
    t0 = time.time()
    state, loss = donate(state, batch_d, jax.random.PRNGKey(1))
    loss = float(jax.device_get(loss))
    dt = (time.time() - t0) / K
    return dict(
        op=args.op, policy=policy, batch=batch,
        mask_ratio=getattr(args, "mask_ratio", 0.0), ms_per_step=dt * 1000,
        img_per_s=batch / dt, loss=loss, compile_s=t_compile, scan_steps=K,
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--op", choices=sorted(OPS), default="1024kv")
    p.add_argument("--policies", default=None,
                   help="comma list to sweep (default: just --policy)")
    p.add_argument("--policy", default="nothing")
    p.add_argument("--batches", default=None, help="comma list of batch sizes")
    p.add_argument("--steps", type=int, default=None, help="scan length")
    p.add_argument("--mask-ratio", type=float, default=0.0,
                   help="MAE-style token-mask ratio (0 = dense; requires a "
                        "non-kv op: 256 or 1024)")
    args = p.parse_args()

    from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    op = OPS[args.op]
    policies = (args.policies or args.policy).split(",")
    batches = [int(b) for b in (args.batches or str(op["batch"])).split(",")]
    for policy in policies:
        for batch in batches:
            try:
                row = bench_one(op, policy, batch, args)
            except Exception as e:  # noqa: BLE001 - OOM rows are data too
                row = dict(op=args.op, policy=policy, batch=batch,
                           error=str(e)[:200])
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
