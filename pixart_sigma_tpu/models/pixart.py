"""PixArt / PixArtMS diffusion transformers (flax.linen).

Behavioural spec: /root/reference/diffusion/model/nets/PixArt.py:62-255 and
PixArtMS.py:85-285 — 28-layer, 1152-wide, 16-head DiT over VAE-latent patches
with adaLN-single timestep conditioning and per-block T5 cross-attention.

TPU-first choices (vs the reference):
- channel-LAST latents: x [B, H, W, C] in, [B, H, W, out_C] out
- the sin-cos pos-embed is computed from the STATIC (H, W) at trace time and
  constant-folds under jit (the reference recomputes it in numpy per forward,
  PixArtMS.py:177-182)
- captions stay padded [B, L, 4096] with a [B, L] mask; no ragged packing and
  no `.tolist()` host sync (PixArtMS.py:201 forces one per step in torch)
- per-block gradient checkpointing via nn.remat (policy: nothing saved)
- bf16 compute / fp32 params by default

One module implements both variants: `multi_scale=False` reproduces PixArt
(fixed square grid, no micro-cond), `multi_scale=True` PixArtMS (arbitrary
H×W + optional size/aspect-ratio micro-conditioning).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pixart_sigma_tpu.models.layers import (
    CaptionEmbedder,
    PatchEmbed,
    PixArtBlock,
    SizeEmbedder,
    T2IFinalLayer,
    TimestepEmbedder,
)
from pixart_sigma_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from pixart_sigma_tpu.parallel.mesh import seq_axis_size, seq_constraint


class _ScanPixArtBlock(PixArtBlock):
    """PixArtBlock with the (carry, out) return convention nn.scan expects."""

    @nn.compact
    def __call__(self, x, y, t0, y_mask):  # type: ignore[override]
        return PixArtBlock.__call__(self, x, y, t0, y_mask), None


class _ScanPixArtBlockKV(PixArtBlock):
    """Scan body taking per-layer hoisted cross-attn K/V (scanned axis 0).

    Same param structure as _ScanPixArtBlock (kv_linear params exist but are
    unused when K/V come precomputed), so checkpoints are interchangeable.
    """

    @nn.compact
    def __call__(self, x, y, t0, y_mask, cross_kv):  # type: ignore[override]
        return PixArtBlock.__call__(self, x, y, t0, y_mask, cross_kv), None


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    """All architecture knobs (reference defaults: PixArtMS.py:93-115)."""

    input_size: int = 32  # latent grid (input px / 8)
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    pred_sigma: bool = True
    caption_channels: int = 4096
    pe_interpolation: float = 1.0
    model_max_length: int = 120
    micro_condition: bool = False
    qk_norm: bool = False
    kv_compress_sampling: Optional[str] = None  # 'conv'|'ave'|'uniform'|'uniform_every'
    kv_compress_scale: int = 1
    kv_compress_layers: Tuple[int, ...] = ()
    multi_scale: bool = True
    # MAE-style masked-token training (reference model/utils.py:192-307 +
    # the gaussian_diffusion.py:836-849 loss hook; train-time only): drop
    # mask_ratio of the latent patches after pos-embed, run the blocks on
    # the kept tokens, scatter back with a learned mask token before the
    # final layer, and return (out, token_mask) for the masked loss.
    mask_ratio: float = 0.0
    mask_type: str = "random"  # 'random' | 'group' (fft/laplacian: ops.masking)
    # runtime knobs
    dtype: Any = jnp.bfloat16
    fp32_attention: bool = False
    attn_impl: str = "auto"
    # Dynamic int8 (W8A8) projection/MLP matmuls — opt-in quantized SERVING
    # mode (ops/quant.py; int8 MXU runs at 2x the bf16 rate on v5e).
    # Checkpoint layout is unchanged; attention math stays bf16/f32.
    quant_int8: bool = False
    grad_checkpointing: bool = False
    # Rematerialisation policy for the per-block nn.remat when
    # grad_checkpointing is on. 'nothing' = save nothing (max memory
    # savings, recompute the whole block in the bwd pass — the reference's
    # torch.utils.checkpoint semantics, model/utils.py:28-45); 'dots' =
    # jax.checkpoint_policies.dots_saveable (keep matmul outputs, recompute
    # elementwise/softmax only); 'dots_no_batch' =
    # dots_with_no_batch_dims_saveable (keep only weight-stationary matmul
    # results). Swept on TPU in docs/performance.md §training.
    remat_policy: str = "nothing"
    # Compile the depth dimension as nn.scan groups (one XLA body per group of
    # identical blocks) instead of `depth` unrolled copies — ~15-20x faster
    # XLA compile for the 28-layer model with identical numerics. Params are
    # stacked [n_layers_in_group, ...] under 'blocks_scan_<g>'.
    scan_blocks: bool = True
    # Delta block caching (opt-in inference accelerator, beyond the
    # reference; cf. Delta-DiT / block-cache papers in PAPERS.md): layers
    # [k1, k2) form their own scan groups so their summed residual can be
    # cached across sampler steps and reused on non-refresh steps. None = off.
    cache_span: Optional[Tuple[int, int]] = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @property
    def base_size(self) -> int:
        return self.input_size // self.patch_size

    def sr_ratio(self, layer: int) -> int:
        if layer in self.kv_compress_layers and self.kv_compress_sampling:
            return int(self.kv_compress_scale)
        return 1

    def block_groups(self) -> list[tuple[int, int]]:
        """Runs of consecutive layers with identical sr_ratio: [(sr, count)].

        A configured cache_span forces group boundaries at its edges so the
        cached middle layers form whole scan groups.
        """
        splits = set()
        if self.cache_span is not None:
            k1, k2 = self.cache_span
            assert 0 <= k1 < k2 <= self.depth, self.cache_span
            splits = {k1, k2}
        groups: list[tuple[int, int]] = []
        for i in range(self.depth):
            sr = self.sr_ratio(i)
            if groups and groups[-1][0] == sr and i not in splits:
                groups[-1] = (sr, groups[-1][1] + 1)
            else:
                groups.append((sr, 1))
        return groups



def _remat_policy(name: str):
    """Map the config string to a jax.checkpoint policy (None = save nothing)."""
    import jax

    cp = jax.checkpoint_policies
    policies = {
        "nothing": None,
        "dots": cp.dots_saveable,
        "dots_no_batch": cp.dots_with_no_batch_dims_saveable,
        # save ONLY the self/cross attention outputs (checkpoint_name tags
        # in models/layers.py): 2*N*D bf16 per layer (~19 MB/layer at
        # 1024px B=4) — the backward skips recomputing the attention
        # kernels while the big MLP/qkv intermediates still rematerialise
        "save_attn": cp.save_only_these_names("attn_out", "cross_out"),
        "everything": cp.everything_saveable,
    }
    try:
        return policies[name]
    except KeyError:
        raise ValueError(
            f"unknown remat_policy {name!r}; expected one of {sorted(policies)}"
        ) from None


class PixArt(nn.Module):
    """The DiT denoiser. Call with NHWC latents; returns NHWC prediction."""

    cfg: PixArtConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, H, W, in_channels]
        timestep: jnp.ndarray,  # [B] (int or float)
        y: jnp.ndarray,  # [B, L, caption_channels]
        y_mask: Optional[jnp.ndarray] = None,  # [B, L]; 1 = valid token
        img_hw: Optional[jnp.ndarray] = None,  # [B, 2] micro-cond size
        aspect_ratio: Optional[jnp.ndarray] = None,  # [B, 1]
        train: bool = False,
        force_drop_ids: Optional[jnp.ndarray] = None,
        block_cache: Optional[jnp.ndarray] = None,  # [B, N, D] cached delta
        use_block_cache: Optional[jnp.ndarray] = None,  # traced bool
        cross_kv: Optional[Sequence[jnp.ndarray]] = None,
        # ^ hoisted caption K/V from precompute_cross_kv (inference only):
        #   one [count, B, L, 2D] stack per scan group (or [B, L, 2D] per
        #   layer when unrolled). When given, CaptionEmbedder and every
        #   block's kv_linear are skipped — they depend only on the captions
        #   and are paid once per trajectory instead of once per NFE.
    ):
        cfg = self.cfg
        assert not (train and cfg.quant_int8), (
            "quant_int8 is a serving-only path: the int8 round/clip in "
            "QuantDense has near-zero gradients and would silently break "
            "training. Train in bf16 and enable quant_int8 at inference."
        )
        B, H, W, C = x.shape
        p = cfg.patch_size
        h, w = H // p, W // p
        if not cfg.multi_scale:
            assert h == w, "fixed-resolution PixArt expects a square grid"
        dtype = cfg.dtype

        pos = get_2d_sincos_pos_embed(
            cfg.hidden_size,
            h,
            w,
            pe_interpolation=cfg.pe_interpolation,
            base_size=cfg.base_size,
        )  # np [h*w, D] — constant under jit

        x = PatchEmbed(
            patch_size=p, embed_dim=cfg.hidden_size, dtype=dtype, name="x_embedder"
        )(x)
        x = x + jnp.asarray(pos, dtype=dtype)[None]
        # sequence parallelism: shard tokens over the ambient 'seq' mesh axis
        # (no-op without one); blocks re-pin this at every boundary
        x = seq_constraint(x)

        token_mask = mask_info = None
        if train and cfg.mask_ratio > 0 and not self.is_initializing():
            # MAE-style token masking: blocks only see the kept subset
            assert cfg.mask_type in ("random", "group"), cfg.mask_type
            assert all(self.cfg.sr_ratio(i) == 1 for i in range(cfg.depth)), (
                "mask_ratio is incompatible with KV compression (the kept "
                "token subset has no spatial grid to downsample)"
            )
            assert block_cache is None
            from pixart_sigma_tpu.ops.masking import get_mask, mask_out_token

            mask_info = get_mask(
                self.make_rng("mask"), B, h * w, cfg.mask_ratio,
                mask_type=cfg.mask_type,
            )
            token_mask = mask_info["mask"]
            x = mask_out_token(x, mask_info["ids_keep"])
        if cfg.mask_ratio > 0:
            # param exists whenever the config enables masking, so the tree
            # is identical between train and eval calls
            mask_token = self.param(
                "mask_token",
                nn.initializers.normal(stddev=0.02),
                (1, 1, cfg.hidden_size),
            )

        t = TimestepEmbedder(cfg.hidden_size, dtype=dtype, name="t_embedder")(
            timestep
        )  # [B, D]

        if cfg.micro_condition:
            assert img_hw is not None and aspect_ratio is not None
            csize = SizeEmbedder(
                cfg.hidden_size // 3, dtype=dtype, name="csize_embedder"
            )(img_hw)
            ar = SizeEmbedder(
                cfg.hidden_size // 3, dtype=dtype, name="ar_embedder"
            )(aspect_ratio)
            t = t + jnp.concatenate([csize, ar], axis=1)

        # shared adaLN-single: one 6D modulation vector for all blocks
        t0 = nn.Dense(
            6 * cfg.hidden_size,
            dtype=dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="t_block",
        )(nn.silu(t))

        if cross_kv is None:
            y = CaptionEmbedder(
                in_channels=cfg.caption_channels,
                hidden_size=cfg.hidden_size,
                uncond_prob=cfg.class_dropout_prob,
                token_num=cfg.model_max_length,
                dtype=dtype,
                name="y_embedder",
            )(y, train=train, force_drop_ids=force_drop_ids)
        else:
            assert not train, "cross_kv hoisting is an inference-only path"

        if y_mask is None:
            y_mask = jnp.ones(y.shape[:2], dtype=jnp.int32)

        def block_kwargs(sr: int) -> dict:
            return dict(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                sampling=cfg.kv_compress_sampling,
                sr_ratio=sr,
                qk_norm=cfg.qk_norm,
                fp32_attention=cfg.fp32_attention,
                attn_impl=cfg.attn_impl,
                hw=(h, w),
                quant=cfg.quant_int8,
                dtype=dtype,
            )

        # build the block modules (scan groups or unrolled) with their start
        # layer indices, so a cache_span can address a contiguous layer range
        use_kv = cross_kv is not None
        mods: list = []
        if cfg.scan_blocks:
            body = _ScanPixArtBlockKV if use_kv else _ScanPixArtBlock
            if cfg.grad_checkpointing:
                body = nn.remat(
                    body, prevent_cse=False,
                    policy=_remat_policy(cfg.remat_policy),
                )
            in_axes = (nn.broadcast, nn.broadcast, nn.broadcast) + (
                (0,) if use_kv else ()
            )
            start = 0
            for g, (sr, count) in enumerate(cfg.block_groups()):
                scanned = nn.scan(
                    body,
                    # 'intermediates' rides along stacked [count, ...] so the
                    # capture_intermediates NaN tracer (utils/debug.py) can
                    # localise a bad output to a layer inside the group
                    variable_axes={"params": 0, "intermediates": 0},
                    split_rngs={"params": True},
                    in_axes=in_axes,
                    length=count,
                )
                mod = scanned(**block_kwargs(sr), name=f"blocks_scan_{g}")
                mods.append((start, mod, True))
                start += count
        else:
            block_cls = PixArtBlock
            if cfg.grad_checkpointing:
                block_cls = nn.remat(
                    PixArtBlock, prevent_cse=False,
                    policy=_remat_policy(cfg.remat_policy),
                )
            for i in range(cfg.depth):
                mod = block_cls(
                    **block_kwargs(cfg.sr_ratio(i)), name=f"blocks_{i}"
                )
                mods.append((i, mod, False))

        def run_range(h, lo, hi):
            for idx, (s, mod, is_scan) in enumerate(mods):
                if lo <= s < hi:
                    if is_scan:
                        if use_kv:
                            h, _ = mod(h, y, t0, y_mask, cross_kv[idx])
                        else:
                            h, _ = mod(h, y, t0, y_mask)
                    elif use_kv:
                        h = mod(h, y, t0, y_mask, cross_kv[idx])
                    else:
                        h = mod(h, y, t0, y_mask)
            return h

        new_cache = None
        if cfg.cache_span is None:
            x = run_range(x, 0, cfg.depth)
        else:
            k1, k2 = cfg.cache_span
            x = run_range(x, 0, k1)
            if block_cache is None or self.is_initializing():
                mid_in = x
                x = run_range(x, k1, k2)
                new_cache = x - mid_in
            else:
                assert use_block_cache is not None

                def reuse(mdl, h):
                    return h + block_cache.astype(h.dtype), block_cache

                def compute(mdl, h):
                    out = run_range(h, k1, k2)
                    return out, (out - h).astype(block_cache.dtype)

                x, new_cache = nn.cond(
                    jnp.asarray(use_block_cache, bool), reuse, compute, self, x
                )
            x = run_range(x, k2, cfg.depth)

        if mask_info is not None:
            from pixart_sigma_tpu.ops.masking import unmask_tokens

            x = unmask_tokens(
                x, mask_info["ids_restore"], mask_token.astype(x.dtype)
            )

        x = T2IFinalLayer(
            hidden_size=cfg.hidden_size,
            patch_size=p,
            out_channels=cfg.out_channels,
            dtype=dtype,
            name="final_layer",
        )(x, t)
        out = self.unpatchify(x, h, w).astype(jnp.float32)
        if seq_axis_size() > 1:
            # pin the output layout: GSPMD otherwise picks an arbitrary 2D
            # (H, W) tiling for the unpatchified image that jax cannot
            # express as a NamedSharding of the ('data', ..., 'seq') mesh.
            # The denoised latent is small — replicate it (one all-gather).
            out = jax.lax.with_sharding_constraint(
                out, jax.sharding.PartitionSpec()
            )
        if block_cache is not None:
            return out, new_cache
        if token_mask is not None:
            return out, token_mask
        return out

    def unpatchify(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        """[B, h*w, p*p*C] -> [B, h*p, w*p, C] (token vector order (p, q, c))."""
        cfg = self.cfg
        p = cfg.patch_size
        c = cfg.out_channels
        B = x.shape[0]
        x = x.reshape(B, h, w, p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # b h p w q c
        return x.reshape(B, h * p, w * p, c)

    def forward_with_dpmsolver(self, x, timestep, y, y_mask=None, **kwargs):
        """Return only the eps half of the output (PixArtMS.py:213-219)."""
        out = self(x, timestep, y, y_mask, **kwargs)
        return out[..., : self.cfg.in_channels]

    def forward_with_cfg(
        self, x, timestep, y, cfg_scale, y_mask=None, cfg_channels: int = 3, **kwargs
    ):
        """Batched-CFG forward for iDDPM ancestral sampling.

        Faithful to PixArtMS.py:221-234 including the DiT-inherited quirk of
        guiding only the first `cfg_channels` (3) channels.
        """
        half = x[: len(x) // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, timestep, y, y_mask, **kwargs)
        eps, rest = out[..., :cfg_channels], out[..., cfg_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


def precompute_cross_kv(
    params, cfg: PixArtConfig, y: jnp.ndarray
) -> list:
    """Caption K/V for every block, computed ONCE per sampler trajectory.

    The cross-attention K/V depend only on the captions (y), never on x_t or
    t, yet the reference — and our plain forward — recompute
    CaptionEmbedder + 28x kv_linear on every NFE (measured 1.65 ms/block at
    the 1024px CFG-24 op point on v5e: ~3% of a sampler step, paid 20x).
    This replays exactly the forward's math on the param tree directly:
      y -> y_proj MLP (gelu-tanh) -> per-group stacked kv_linear einsum
    and returns one [count, B, L, 2D] stack per entry of cfg.block_groups()
    (scan layout) or one [B, L, 2D] per layer (unrolled), for the model's
    `cross_kv` argument. Inference only (no caption dropout).
    """
    from pixart_sigma_tpu.models.layers import gelu_tanh

    dtype = cfg.dtype
    yp = params["y_embedder"]["y_proj"]
    h = y.astype(dtype) @ yp["fc1"]["kernel"].astype(dtype) + yp["fc1"][
        "bias"
    ].astype(dtype)
    h = gelu_tanh(h)
    emb = h @ yp["fc2"]["kernel"].astype(dtype) + yp["fc2"]["bias"].astype(dtype)

    out = []
    if cfg.scan_blocks:
        for g in range(len(cfg.block_groups())):
            kv_p = params[f"blocks_scan_{g}"]["cross_attn"]["kv_linear"]
            kv = jnp.einsum(
                "bmc,lcd->lbmd", emb, kv_p["kernel"].astype(dtype)
            ) + kv_p["bias"].astype(dtype)[:, None, None, :]
            out.append(kv)
    else:
        for i in range(cfg.depth):
            kv_p = params[f"blocks_{i}"]["cross_attn"]["kv_linear"]
            out.append(
                emb @ kv_p["kernel"].astype(dtype)
                + kv_p["bias"].astype(dtype)
            )
    return out


def PixArt_XL_2(**overrides) -> PixArt:
    """0.6B fixed-resolution model (PixArt.py:313-315)."""
    overrides.setdefault("multi_scale", False)
    kw = dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16)
    kw.update(overrides)
    return PixArt(PixArtConfig(**kw))


def PixArtMS_XL_2(**overrides) -> PixArt:
    """0.6B multi-scale model (PixArtMS.py:291-293)."""
    overrides.setdefault("multi_scale", True)
    kw = dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16)
    kw.update(overrides)
    return PixArt(PixArtConfig(**kw))
