"""PixArtPipeline: the diffusers-style txt2img entry point.

Specs: scripts/inference.py:53-143 (visualize() — the three sampler
branches), scripts/diffusers_patches.py:479-573 (PixArtSigmaPipeline), and
app/app_pixart_dmd.py:193-204 (one-step DMD operating point).

Every sampler trajectory is one jitted on-device program (compiled per
static (batch, H, W, steps) and cached); CFG is batched 2x inside. T5 encode
and VAE decode are separate jitted programs; 2K/4K decode goes through the
tiled decoder.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.diffusion import IDDPM
from pixart_sigma_tpu.diffusion.dpm_solver import (
    DPMSolver,
    NoiseScheduleVP,
    make_cfg_model_fn,
)
from pixart_sigma_tpu.diffusion.lcm import LCMScheduler
from pixart_sigma_tpu.diffusion.sa_solver import SASolver
from pixart_sigma_tpu.diffusion.schedules import named_beta_schedule
from pixart_sigma_tpu.data.aspect import aspect_ratio_table, get_closest_ratio
from pixart_sigma_tpu.utils.prompt import prepare_prompt_ar


class PixArtPipeline:
    """Bundles denoiser + T5 + VAE and runs the samplers.

    model/params: the PixArt flax module + param dict ({'params': ...}).
    t5: a T5Embedder (or None to accept precomputed embeddings).
    vae/vae_params: AutoencoderKL (or None to return raw latents).
    """

    def __init__(
        self,
        model,
        params,
        t5=None,
        vae=None,
        vae_params=None,
        scale_factor: float = 0.13025,
        beta_schedule: str = "linear",
        num_train_timesteps: int = 1000,
        base_resolution: int = 1024,
        mesh=None,
    ):
        self.model = model
        self.params = params
        self.t5 = t5
        self.vae = vae
        self.vae_params = vae_params
        self.scale_factor = scale_factor
        self.betas = named_beta_schedule(beta_schedule, num_train_timesteps)
        self.ns = NoiseScheduleVP("discrete", betas=self.betas)
        self.base_resolution = base_resolution
        self._jit_cache: Dict[Any, Any] = {}
        # data-parallel serving: batch sharded over the mesh, params replicated
        self.mesh = mesh
        if mesh is not None:
            from pixart_sigma_tpu.parallel.mesh import data_sharding, replicated

            self._batch_sharding = data_sharding(mesh)
            self.params = jax.device_put(self.params, replicated(mesh))

    def _shard(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return x
        return jax.device_put(x, self._batch_sharding)

    # ------------------------------------------------------------- encoders
    def encode_prompts(self, prompts: Sequence[str]):
        assert self.t5 is not None, "pipeline built without a T5 encoder"
        return self.t5.get_text_embeddings(list(prompts))

    def null_embedding(self, batch: int):
        """T5 embedding of the empty prompt (reference inference.py:199-202)."""
        y, mask = self.encode_prompts([""] * batch)
        return y, mask

    # ------------------------------------------------------------- samplers
    def _latents_to_images(self, latents: jnp.ndarray) -> np.ndarray:
        if self.vae is None:
            return np.asarray(latents)
        from pixart_sigma_tpu.models.vae import AutoencoderKL, make_tiled_decode

        z = latents / self.scale_factor

        if z.shape[1] > 128 or z.shape[2] > 128:  # beyond 1024px: tile
            # single-program tiled decode (one dispatch; the host-loop
            # variant pays a tunnel round trip per tile — 2K 7.3 -> ~1 s)
            tiled = self._cached(
                ("vae_decode_tiled",),
                lambda: make_tiled_decode(
                    lambda zz: self.vae.apply(
                        self.vae_params, zz, method=AutoencoderKL.decode
                    )
                ),
            )
            img = tiled(z)
        else:
            decode = self._cached(
                ("vae_decode",),
                lambda: jax.jit(
                    lambda p, z: self.vae.apply(
                        p, z, method=AutoencoderKL.decode
                    )
                ),
            )
            img = decode(self.vae_params, z)
        img = np.asarray(jnp.clip((img + 1.0) / 2.0, 0.0, 1.0))
        return (img * 255).round().astype(np.uint8)

    def _seq_parallel(self) -> bool:
        """True when the pipeline mesh carries a real 'seq' axis
        (sequence/context parallelism over the token dim)."""
        return self.mesh is not None and dict(
            zip(self.mesh.axis_names, self.mesh.devices.shape)
        ).get("seq", 1) > 1

    def _cached(self, key, build):
        if key not in self._jit_cache:
            fn = build()
            if self._seq_parallel():
                # the model's seq_constraint annotations read the AMBIENT
                # mesh at trace time: trace+run under jax.set_mesh
                raw, mesh = fn, self.mesh

                def fn(*a, **kw):
                    with jax.set_mesh(mesh):
                        return raw(*a, **kw)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def __call__(
        self,
        prompts: Union[str, Sequence[str]],
        *,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 20,
        guidance_scale: float = 4.5,
        sampler: str = "dpm-solver",
        # 'dpm-solver'|'deis'|'sde-dpm-solver'|'iddpm'|'sa-solver'|'lcm'|'dmd'
        seed: int = 0,
        negative_prompt: str = "",
        y: Optional[jnp.ndarray] = None,
        y_mask: Optional[jnp.ndarray] = None,
        y_null: Optional[jnp.ndarray] = None,
        latents: Optional[jnp.ndarray] = None,
        return_latents: bool = False,
        block_cache_interval: int = 0,  # >=2: delta block caching (turbo)
        block_cache_threshold: Optional[float] = None,  # adaptive (TeaCache-style)
        block_cache_schedule: Optional[Sequence[int]] = None,  # explicit NFEs
    ) -> np.ndarray:
        """Generate images. Prompts may carry --ar h:w / --hw h:w flags.

        block_cache_interval N >= 2 enables Delta-DiT-style block caching
        for the dpm-solver sampler (model must be built with
        cache_span=(k1, k2)): the middle layers' residual is refreshed every
        N NFE and reused in between — ~(k2-k1)/depth fewer block FLOPs on
        cached steps at a small quality cost. 0/1 = exact (off).

        block_cache_threshold instead refreshes ADAPTIVELY (TeaCache-style,
        PAPERS.md): each NFE accumulates the relative L1 change of the latent
        input; the cached residual is reused while the accumulated drift
        stays under the threshold and recomputed (drift reset) once it
        crosses it. More refreshes early/late in the trajectory where the
        latent moves fast, fewer in the smooth middle — better
        quality-per-NFE than a fixed interval. Typical values 0.05-0.3;
        first and last steps always refresh. Overrides
        block_cache_interval."""
        if isinstance(prompts, str):
            prompts = [prompts]
        B = len(prompts)
        ratios = aspect_ratio_table(self.base_resolution, test=True)

        clean_prompts, hws, ars = [], [], []
        for p in prompts:
            cp, hw, ar, _ = prepare_prompt_ar(p, ratios)
            clean_prompts.append(cp)
            hws.append(hw[0])
            ars.append(ar[0])
        if height is None or width is None:
            height, width = int(hws[0][0]), int(hws[0][1])
        if not getattr(self.model.cfg, "multi_scale", True) and height != width:
            # fixed-resolution PixArt only supports square grids; snap to base
            height = width = self.base_resolution
        h, w = height // 8, width // 8

        if y is None:
            if self.t5 is None:
                # no text encoder: condition on the learned null caption so
                # the full path still runs (smoke tests / encoder-less setups)
                import warnings

                warnings.warn(
                    "pipeline has no T5 encoder; conditioning on the null "
                    "caption embedding — outputs are UNCONDITIONAL"
                )
                null_emb = self.params["params"]["y_embedder"]["y_embedding"]
                y = jnp.broadcast_to(
                    null_emb[None], (B, *null_emb.shape)
                ).astype(jnp.float32)
                y_mask = jnp.ones((B, null_emb.shape[0]), jnp.int32)
            else:
                y, y_mask = self.encode_prompts(clean_prompts)
        if y_null is None:
            if self.t5 is None:
                null_y, null_mask = y, y_mask
            else:
                null_y, null_mask = self.encode_prompts([negative_prompt] * B)
        else:
            null_y, null_mask = y_null, y_mask
        mask_full = jnp.concatenate([null_mask, y_mask], axis=0)

        img_hw = jnp.asarray(np.stack(hws), jnp.float32)
        aspect = jnp.asarray(np.stack(ars), jnp.float32)
        micro = getattr(self.model.cfg, "micro_condition", False)

        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        if latents is not None:
            # caller-supplied init noise (diffusers `latents=`; DMD pair
            # generation needs the exact noise persisted next to the output)
            assert latents.shape == (B, h, w, 4), (latents.shape, (B, h, w, 4))
            x = self._shard(jnp.asarray(latents, jnp.float32))
        else:
            x = self._shard(
                jax.random.normal(init_rng, (B, h, w, 4), jnp.float32))
        y = self._shard(y)
        null_y = self._shard(null_y)
        mask_full = self._shard(mask_full)

        schedule = (
            None if block_cache_schedule is None
            else tuple(sorted(set(int(i) for i in block_cache_schedule)))
        )
        key = (sampler, B, h, w, num_inference_steps, float(guidance_scale),
               micro, block_cache_interval,
               None if block_cache_threshold is None
               else float(block_cache_threshold), schedule)
        cache_on = (block_cache_interval >= 2
                    or block_cache_threshold is not None
                    or schedule is not None)
        if cache_on and sampler != "dpm-solver":
            raise ValueError(
                "block caching requires sampler='dpm-solver' "
                f"(got {sampler!r})"
            )
        if sampler == "dpm-solver" and cache_on:
            fn = self._cached(key, lambda: self._build_dpm_cached(
                B, h, w, num_inference_steps, guidance_scale, micro,
                block_cache_interval,
                adaptive_threshold=block_cache_threshold,
                schedule=schedule))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect)
        elif sampler == "dpm-solver":
            fn = self._cached(key, lambda: self._build_dpm(
                B, h, w, num_inference_steps, guidance_scale, micro))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect)
        elif sampler == "deis":
            fn = self._cached(key, lambda: self._build_deis(
                B, h, w, num_inference_steps, guidance_scale, micro))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect)
        elif sampler == "sde-dpm-solver":
            fn = self._cached(key, lambda: self._build_sde_dpm(
                B, h, w, num_inference_steps, guidance_scale, micro))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect, rng)
        elif sampler == "sa-solver":
            fn = self._cached(key, lambda: self._build_sa(
                B, h, w, num_inference_steps, guidance_scale, micro))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect, rng)
        elif sampler == "iddpm":
            fn = self._cached(key, lambda: self._build_iddpm(
                B, h, w, num_inference_steps, guidance_scale, micro))
            latents = fn(self.params, x, y, null_y, mask_full, img_hw, aspect, rng)
        elif sampler == "lcm":
            fn = self._cached(key, lambda: self._build_lcm(
                B, h, w, num_inference_steps, micro))
            latents = fn(self.params, x, y, y_mask, img_hw, aspect, rng)
        elif sampler == "dmd":
            # one-NFE DMD generator at t=400 (app_pixart_dmd.py:193-204)
            fn = self._cached(key, lambda: self._build_dmd(B, h, w, micro))
            latents = fn(self.params, x, y, y_mask, img_hw, aspect)
        else:
            raise ValueError(f"unknown sampler {sampler}")

        if return_latents:
            return np.asarray(latents)
        return self._latents_to_images(latents)

    # ---------------------------------------------------------- builders
    def _apply_eps(self, params, x, t_vec, cond, mask, img_hw, aspect, micro,
                   cross_kv=None):
        kwargs = {}
        if micro:
            n = x.shape[0] // img_hw.shape[0]
            kwargs = dict(
                img_hw=jnp.tile(img_hw, (n, 1)),
                aspect_ratio=jnp.tile(aspect, (n, 1)),
            )
        out = self.model.apply(
            params, x, t_vec, cond, mask, cross_kv=cross_kv, **kwargs
        )
        return out[..., :4]

    def _hoisted_kv(self, params, y_cat):
        """Caption K/V for the CFG-concatenated batch, computed once per
        trajectory instead of per NFE (saves a measured ~3% of the 1024px
        sampler step; see models/pixart.py:precompute_cross_kv)."""
        from pixart_sigma_tpu.models.pixart import precompute_cross_kv

        return precompute_cross_kv(params["params"], self.model.cfg, y_cat)

    def _build_dpm(self, B, h, w, steps, cfg_scale, micro):
        def run(params, x, y, null_y, mask, img_hw, aspect):
            kvs = self._hoisted_kv(params, jnp.concatenate([null_y, y], axis=0))
            apply_fn = lambda xi, t, c, **kw: self._apply_eps(
                params, xi, t, c, mask, img_hw, aspect, micro, cross_kv=kvs
            )
            model_fn = make_cfg_model_fn(
                apply_fn, self.ns, condition=y, uncondition=null_y,
                cfg_scale=cfg_scale,
            )
            solver = DPMSolver(model_fn, self.ns, algorithm_type="dpmsolver++")
            return solver.sample(x, steps=steps, order=2, method="multistep")

        return jax.jit(run)

    def _build_deis(self, B, h, w, steps, cfg_scale, micro):
        from pixart_sigma_tpu.diffusion.deis import DEISMultistep

        def run(params, x, y, null_y, mask, img_hw, aspect):
            kvs = self._hoisted_kv(params, jnp.concatenate([null_y, y], axis=0))
            apply_fn = lambda xi, t, c, **kw: self._apply_eps(
                params, xi, t, c, mask, img_hw, aspect, micro, cross_kv=kvs
            )
            model_fn = make_cfg_model_fn(
                apply_fn, self.ns, condition=y, uncondition=null_y,
                cfg_scale=cfg_scale,
            )
            return DEISMultistep(model_fn, self.ns).sample(
                x, steps=steps, order=2)

        return jax.jit(run)

    def _build_sde_dpm(self, B, h, w, steps, cfg_scale, micro):
        def run(params, x, y, null_y, mask, img_hw, aspect, rng):
            kvs = self._hoisted_kv(params, jnp.concatenate([null_y, y], axis=0))
            apply_fn = lambda xi, t, c, **kw: self._apply_eps(
                params, xi, t, c, mask, img_hw, aspect, micro, cross_kv=kvs
            )
            model_fn = make_cfg_model_fn(
                apply_fn, self.ns, condition=y, uncondition=null_y,
                cfg_scale=cfg_scale,
            )
            solver = DPMSolver(
                model_fn, self.ns, algorithm_type="sde-dpmsolver++")
            return solver.sample_sde(x, rng, steps=steps, order=2)

        return jax.jit(run)

    def _build_dpm_cached(self, B, h, w, steps, cfg_scale, micro, interval,
                          adaptive_threshold=None, schedule=None,
                          t_start=None, t_end=None):
        """DPM-Solver++ with delta block caching (opt-in turbo mode).

        Requires model.cfg.cache_span=(k1, k2). The cached middle-layer
        residual rides the sampler scan carry; steps refresh it every
        `interval` NFE and reuse it otherwise (Delta-DiT-style, beyond the
        reference). interval=1 reproduces the exact uncached trajectory.

        adaptive_threshold switches the refresh policy to a TeaCache-style
        drift indicator: per NFE, accumulate mean|x_t - x_prev| / mean|x_prev|
        (the latent's relative L1 step); reuse the cache while the
        accumulated drift since the last refresh is under the threshold,
        otherwise recompute and reset. The decision is a traced scalar, so
        the whole trajectory stays one compiled scan with both branches
        resident (nn.cond); first/last steps always refresh.
        """
        cfg = self.model.cfg
        assert cfg.cache_span is not None, "model needs cache_span for turbo"
        ns = self.ns
        n_tokens = (h // cfg.patch_size) * (w // cfg.patch_size)
        adaptive = adaptive_threshold is not None
        if adaptive:
            # static mask marks forced refreshes; drift decides the rest
            refresh = np.zeros(steps, bool)
            refresh[0] = refresh[-1] = True
        elif schedule is not None:
            # scheduled policy: explicit refresh NFEs (dense at the
            # trajectory ends where the latent moves fast, sparse in the
            # smooth middle — can beat the fixed interval at equal refresh
            # count; see docs/performance.md)
            refresh = np.zeros(steps, bool)
            refresh[np.asarray(sorted(set(schedule)), int)] = True
            assert refresh[0], "step 0 must refresh (cache starts empty)"
        else:
            refresh = np.asarray([i % interval == 0 for i in range(steps)])

        def run(params, x, y, null_y, mask, img_hw, aspect):
            c_in = jnp.concatenate([null_y, y], axis=0)
            kvs = self._hoisted_kv(params, c_in)

            # NOTE: mirrors make_cfg_model_fn's CFG batching and
            # _apply_eps's micro-conditioning — keep the time convention
            # ((t - 1/N) * 1000) and [uncond, cond] order in sync with them
            def state_model_fn(xi, t_cont, state, use_cache):
                if adaptive:
                    cache, x_prev, drift = state
                    rel = jnp.mean(jnp.abs(xi - x_prev)) / (
                        jnp.mean(jnp.abs(x_prev)) + 1e-8
                    )
                    drift = drift + rel
                    use_cache = jnp.logical_and(
                        use_cache, drift < adaptive_threshold
                    )
                    drift = jnp.where(use_cache, drift, 0.0)
                else:
                    cache = state
                x_in = jnp.concatenate([xi, xi], axis=0)
                t_model = (
                    (jnp.asarray(t_cont, jnp.float32) - 1.0 / ns.total_N)
                    * 1000.0
                )
                t_vec = jnp.broadcast_to(t_model, (x_in.shape[0],))
                kwargs = {}
                if micro:
                    n = x_in.shape[0] // img_hw.shape[0]
                    kwargs = dict(
                        img_hw=jnp.tile(img_hw, (n, 1)),
                        aspect_ratio=jnp.tile(aspect, (n, 1)),
                    )
                out, cache = self.model.apply(
                    params, x_in.astype(cfg.dtype), t_vec, c_in, mask,
                    block_cache=cache, use_block_cache=use_cache,
                    cross_kv=kvs, **kwargs,
                )
                eps = out[..., :4]
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                guided = eps_u + cfg_scale * (eps_c - eps_u)
                if adaptive:
                    return guided, (cache, xi, drift)
                return guided, cache

            cache0 = jnp.zeros((2 * B, n_tokens, cfg.hidden_size), cfg.dtype)
            if adaptive:
                cache0 = (cache0, jnp.zeros_like(x), jnp.asarray(0.0))
            solver = DPMSolver(
                lambda *_: None, self.ns, algorithm_type="dpmsolver++"
            )
            return solver.sample_scan(
                x, steps=steps,
                t_start=ns.T if t_start is None else t_start,
                t_end=(1.0 / ns.total_N) if t_end is None else t_end,
                order=2,
                state_model_fn=state_model_fn, model_state=cache0,
                refresh_mask=refresh,
            )

        return jax.jit(run)

    def _build_sa(self, B, h, w, steps, cfg_scale, micro):
        def run(params, x, y, null_y, mask, img_hw, aspect, rng):
            kvs = self._hoisted_kv(params, jnp.concatenate([null_y, y], axis=0))
            apply_fn = lambda xi, t, c, **kw: self._apply_eps(
                params, xi, t, c, mask, img_hw, aspect, micro, cross_kv=kvs
            )
            model_fn = make_cfg_model_fn(
                apply_fn, self.ns, condition=y, uncondition=null_y,
                cfg_scale=cfg_scale,
            )
            solver = SASolver(model_fn, self.ns, algorithm_type="data_prediction")
            tau = lambda t: 1.0 if 0.2 <= t <= 0.8 else 0.0
            return solver.sample(
                "few_steps", x, tau, steps, rng,
                predictor_order=2, corrector_order=2, pc_mode="PEC",
            )

        return jax.jit(run)

    def _build_iddpm(self, B, h, w, steps, cfg_scale, micro):
        diffusion = IDDPM(timestep_respacing=str(steps), learn_sigma=True)

        def run(params, x, y, null_y, mask, img_hw, aspect, rng):
            y_full = jnp.concatenate([y, null_y], axis=0)  # cond first: fwd_with_cfg
            kvs = self._hoisted_kv(params, y_full)

            def model_fn(x_t, t_vec):
                # batched CFG inside forward_with_cfg (PixArtMS.py:221-234)
                x2 = jnp.concatenate([x_t, x_t], axis=0)
                kwargs = {}
                if micro:
                    kwargs = dict(
                        img_hw=jnp.tile(img_hw, (2, 1)),
                        aspect_ratio=jnp.tile(aspect, (2, 1)),
                    )
                out = self.model.apply(
                    params, x2, jnp.concatenate([t_vec, t_vec]), y_full,
                    mask, cross_kv=kvs, **kwargs
                )
                eps, rest = out[..., :3], out[..., 3:]
                cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
                half = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
                return jnp.concatenate([half, rest[:B]], axis=-1)

            return diffusion.p_sample_loop(
                model_fn, (B, h, w, 4), rng, noise=x, clip_denoised=False
            )

        return jax.jit(run)

    def _build_dmd(self, B, h, w, micro, start_ts: int = 400):
        acp = float(
            np.cumprod(1.0 - self.betas)[start_ts]
        )

        def run(params, x, y, y_mask, img_hw, aspect):
            t_vec = jnp.full((B,), float(start_ts), jnp.float32)
            kwargs = {}
            if micro:
                kwargs = dict(img_hw=img_hw, aspect_ratio=aspect)
            eps = self.model.apply(params, x, t_vec, y, y_mask, **kwargs)[..., :4]
            return (x - (1 - acp) ** 0.5 * eps) / acp**0.5

        return jax.jit(run)

    def _build_lcm(self, B, h, w, steps, micro):
        scheduler = LCMScheduler()

        def run(params, x, y, y_mask, img_hw, aspect, rng):
            def model_fn(x_t, t_vec):
                kwargs = {}
                if micro:
                    kwargs = dict(img_hw=img_hw, aspect_ratio=aspect)
                out = self.model.apply(params, x_t, t_vec, y, y_mask, **kwargs)
                return out[..., :4]

            return scheduler.sample(
                model_fn, (B, h, w, 4), rng,
                num_inference_steps=steps, noise=x,
            )

        return jax.jit(run)
