"""DiT building blocks: embedders, adaLN-single modulation, attention layers.

Behavioural spec: /root/reference/diffusion/model/nets/PixArt_blocks.py
(t2i_modulate :24, MultiHeadCrossAttention :28-58, AttentionKVCompress
:61-158, T2IFinalLayer :205-221, TimestepEmbedder :267-309, SizeEmbedder
:312-344, CaptionEmbedder :378-407) and PixArtMS.py PatchEmbed :22-46.

TPU-first choices:
- channel-last everywhere; PatchEmbed is reshape+Dense (identical math to the
  reference's stride-p conv, but lowers to a single MXU matmul)
- cross-attention uses a padded [B, L] mask instead of ragged packing
- KV compression's 'conv' mode is a depthwise conv expressed as
  lax.conv_general_dilated with feature_group_count=dim (maps to XLA:TPU
  depthwise conv); 'ave'/'uniform' are strided slices
- all Dense layers take a compute dtype (bf16 for training/inference) with
  fp32 params
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from pixart_sigma_tpu.ops.attention import attention
from pixart_sigma_tpu.parallel.mesh import seq_axis_size, seq_constraint

Dtype = Any

# init matching the reference: xavier-uniform linens, zeros bias
xavier = nn.initializers.xavier_uniform()
normal02 = nn.initializers.normal(stddev=0.02)
zeros = nn.initializers.zeros


def t2i_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray):
    """adaLN-single modulation: x * (1 + scale) + shift (broadcast over tokens)."""
    return x * (1 + scale) + shift


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return nn.gelu(x, approximate=True)


class QuantDense(nn.Module):
    """Drop-in nn.Dense with a dynamic-int8 (W8A8) matmul (ops/quant.py).

    Identical param names/shapes/dtypes to nn.Dense, so every checkpoint
    dialect loads unchanged; only the compute path differs (int8 MXU
    accumulation — 2x the bf16 rate on v5e). Opt-in via config
    `quant_int8` for the serving path; not a reference feature.
    """

    features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from pixart_sigma_tpu.ops.quant import int8_matmul

        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)


def _dense(features, *, quant: bool, dtype, kernel_init, name: str):
    """nn.Dense, or its int8 twin when the quantized serving path is on."""
    cls = QuantDense if quant else nn.Dense
    return cls(features, dtype=dtype, kernel_init=kernel_init, name=name)


class Mlp(nn.Module):
    """Transformer MLP (timm Mlp semantics: fc1 -> act -> fc2)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = _dense(
            self.hidden_features, quant=self.quant, dtype=self.dtype,
            kernel_init=self.kernel_init, name="fc1",
        )(x)
        x = gelu_tanh(x)
        x = _dense(
            self.out_features, quant=self.quant, dtype=self.dtype,
            kernel_init=self.kernel_init, name="fc2",
        )(x)
        return x


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal features, [B] -> [B, dim]; cos first (GLIDE convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """Sinusoidal(256) -> Dense -> SiLU -> Dense."""

    hidden_size: int
    freq_embed_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.freq_embed_size).astype(self.dtype)
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=normal02, name="fc1"
        )(x)
        x = nn.silu(x)
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=normal02, name="fc2"
        )(x)
        return x


class SizeEmbedder(nn.Module):
    """Embed per-sample size scalars; [B, d] -> [B, d * hidden_size]."""

    hidden_size: int
    freq_embed_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        if s.ndim == 1:
            s = s[:, None]
        b, dims = s.shape
        x = timestep_embedding(s.reshape(-1), self.freq_embed_size).astype(self.dtype)
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=normal02, name="fc1"
        )(x)
        x = nn.silu(x)
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, kernel_init=normal02, name="fc2"
        )(x)
        return x.reshape(b, dims * self.hidden_size)


class CaptionEmbedder(nn.Module):
    """Project T5 features to hidden size; CFG token-drop to a learned null.

    y_embedding is the learned null caption ([token_num, in_channels]); during
    training each sample's caption is replaced by it with prob uncond_prob
    (rng collection 'caption_drop'), or as forced by `force_drop_ids`.
    """

    in_channels: int
    hidden_size: int
    uncond_prob: float = 0.1
    token_num: int = 120
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        caption: jnp.ndarray,  # [B, L, in_channels]
        train: bool = False,
        force_drop_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        y_embedding = self.param(
            "y_embedding",
            nn.initializers.normal(stddev=self.in_channels**-0.5),
            (self.token_num, self.in_channels),
        )
        if (train and self.uncond_prob > 0) or force_drop_ids is not None:
            if force_drop_ids is None:
                rng = self.make_rng("caption_drop")
                drop = jax.random.uniform(rng, (caption.shape[0],)) < self.uncond_prob
            else:
                drop = force_drop_ids == 1
            caption = jnp.where(
                drop[:, None, None], y_embedding.astype(caption.dtype), caption
            )
        return Mlp(
            hidden_features=self.hidden_size,
            out_features=self.hidden_size,
            dtype=self.dtype,
            kernel_init=normal02,
            name="y_proj",
        )(caption.astype(self.dtype))


class PatchEmbed(nn.Module):
    """Patchify + linear: [B, H, W, C] -> [B, H/p * W/p, D].

    Equivalent to the reference's Conv2d(k=p, s=p) (PixArtMS.py:38) but as a
    reshape + one MXU matmul. Patch-vector order is (p_row, p_col, channel),
    matching the converter's conv-weight flattening.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, f"{(H, W)} not divisible by {p}"
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p), p * p * C)
        return nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=xavier, name="proj"
        )(x.astype(self.dtype))


class SelfAttentionKVCompress(nn.Module):
    """Self-attention with optional Sigma KV token compression and QK-norm.

    Spec: AttentionKVCompress (PixArt_blocks.py:61-158). KV compression
    spatially downsamples K and V by sr_ratio before attention:
      - 'conv': depthwise conv k=s=sr (avg-init) + LayerNorm (learned)
      - 'ave' / 'uniform': strided subsample (identical for integer ratios)
      - 'uniform_every': every sr-th token of the flattened sequence
    QK-norm is LayerNorm over the FULL model dim before head split,
    matching the reference (:90-95,133-134).
    """

    dim: int
    num_heads: int
    sampling: Optional[str] = None
    sr_ratio: int = 1
    qk_norm: bool = False
    fp32_attention: bool = False
    attn_impl: str = "auto"
    hw: Optional[tuple[int, int]] = None  # static latent grid (h, w)
    quant: bool = False  # int8 qkv/proj matmuls (attention math stays bf16)
    dtype: Dtype = jnp.float32

    def _downsample(self, t: jnp.ndarray, H: int, W: int, conv_params) -> jnp.ndarray:
        """[B, N, C] -> [B, N/sr^2, C] spatial downsample.

        `conv_params` (kernel, bias, norm) is created once in __call__ and
        shared between K and V, matching the reference's single `self.sr`.
        """
        sr = self.sr_ratio
        B, N, C = t.shape
        if self.sampling == "uniform_every":
            return t[:, ::sr]
        t = t.reshape(B, H, W, C)
        if self.sampling in ("ave", "uniform"):
            # nearest-neighbour downsample == strided subsample for integer sr
            t = t[:, ::sr, ::sr, :]
        elif self.sampling == "conv":
            kernel, bias, norm = conv_params
            t = jax.lax.conv_general_dilated(
                t.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(sr, sr),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + bias.astype(self.dtype)
            t = norm(t)
        else:
            raise ValueError(f"unknown sampling {self.sampling}")
        return t.reshape(B, -1, C)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H, W = self.hw if self.hw is not None else (int(N**0.5), int(N**0.5))
        qkv = _dense(
            3 * C, quant=self.quant, dtype=self.dtype, kernel_init=xavier,
            name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.qk_norm:
            q = nn.LayerNorm(dtype=self.dtype, name="q_norm")(q)
            k = nn.LayerNorm(dtype=self.dtype, name="k_norm")(k)
        if self.sr_ratio > 1 and self.sampling is not None:
            conv_params = None
            if self.sampling == "conv":
                sr = self.sr_ratio
                kernel = self.param(
                    "sr_kernel",
                    lambda key, shape, dtype: jnp.full(shape, 1.0 / sr**2, dtype),
                    (sr, sr, 1, C),
                    jnp.float32,
                )
                bias = self.param("sr_bias", zeros, (C,), jnp.float32)
                norm = nn.LayerNorm(dtype=self.dtype, name="sr_norm")
                conv_params = (kernel, bias, norm)
            k = self._downsample(k, H, W, conv_params)
            v = self._downsample(v, H, W, conv_params)
        M = k.shape[1]
        dh = C // self.num_heads
        q4 = q.reshape(B, N, self.num_heads, dh)
        k4 = k.reshape(B, M, self.num_heads, dh)
        v4 = v.reshape(B, M, self.num_heads, dh)
        if seq_axis_size() > 1:
            # context-parallel self-attention: queries stay token-sharded.
            # K/V layout depends on the impl the dispatcher will pick:
            # seqshard/chunked want K/V gathered over the seq axis once
            # (cheap O(M*C) vs the O(N*M*C/seq) attention compute) but
            # KEEP the batch dim sharded over data/fsdp (a full P() here
            # would redundantly gather the batch); ring wants K/V to stay
            # token-sharded — gathering would materialise exactly the
            # >RING_KV_BYTES replicated buffer ring exists to avoid.
            from jax.sharding import PartitionSpec as P

            from pixart_sigma_tpu.ops.attention import _dispatch
            from pixart_sigma_tpu.parallel.mesh import batch_shard_axes

            q4 = seq_constraint(q4)
            choice = (
                _dispatch(q4, k4, None)
                if self.attn_impl in ("auto", "auto_local")
                else self.attn_impl
            )
            batch_axes = batch_shard_axes() or None
            tok = "seq" if choice == "ring" else None
            kv_spec = P(batch_axes, tok, None, None)
            k4 = jax.lax.with_sharding_constraint(k4, kv_spec)
            v4 = jax.lax.with_sharding_constraint(v4, kv_spec)
        out = attention(
            q4, k4, v4,
            fp32_softmax=self.fp32_attention,
            impl=self.attn_impl,
        ).reshape(B, N, C)
        return _dense(
            C, quant=self.quant, dtype=self.dtype, kernel_init=xavier,
            name="proj",
        )(out)


class MultiHeadCrossAttention(nn.Module):
    """Image queries attend to padded T5 caption keys/values.

    Spec: PixArt_blocks.py:28-58. Padding mask replaces BlockDiagonalMask;
    proj is ZERO-init (PixArt.py:247-249) so blocks start as identity.
    """

    dim: int
    num_heads: int
    fp32_attention: bool = False
    attn_impl: str = "auto"
    quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, C]
        cond: jnp.ndarray,  # [B, L, C]
        mask: Optional[jnp.ndarray] = None,  # [B, L] valid-token mask
        kv: Optional[jnp.ndarray] = None,  # [B, L, 2C] precomputed K/V
    ) -> jnp.ndarray:
        """`kv`: caption K/V precomputed ONCE per trajectory (they depend
        only on the captions, not on x_t / t — recomputing kv_linear every
        NFE costs a measured 1.65 ms x 28 blocks ~3% of a 1024px sampler
        step on v5e). See pixart.precompute_cross_kv."""
        B, N, C = x.shape
        dh = C // self.num_heads
        q = _dense(
            C, quant=self.quant, dtype=self.dtype, kernel_init=xavier,
            name="q_linear",
        )(x)
        if kv is None:
            kv = _dense(
                2 * C, quant=self.quant, dtype=self.dtype, kernel_init=xavier,
                name="kv_linear",
            )(cond)
        else:
            kv = kv.astype(self.dtype)
        L = kv.shape[1]
        k, v = jnp.split(kv, 2, axis=-1)
        out = attention(
            q.reshape(B, N, self.num_heads, dh),
            k.reshape(B, L, self.num_heads, dh),
            v.reshape(B, L, self.num_heads, dh),
            key_mask=None if mask is None else mask.astype(bool),
            fp32_softmax=self.fp32_attention,
            impl=self.attn_impl,
        ).reshape(B, N, C)
        return _dense(
            C, quant=self.quant, dtype=self.dtype, kernel_init=zeros,
            name="proj",
        )(out)


class T2IFinalLayer(nn.Module):
    """Final LN + 2-way scale/shift from t-embedding + zero-init projection."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=self.hidden_size**-0.5),
            (2, self.hidden_size),
        )
        ss = table[None].astype(self.dtype) + t[:, None].astype(self.dtype)
        shift, scale = ss[:, 0:1], ss[:, 1:2]
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm_final",
        )(x)
        x = t2i_modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size**2 * self.out_channels,
            dtype=self.dtype,
            kernel_init=zeros,
            name="linear",
        )(x)


class PixArtBlock(nn.Module):
    """DiT block: adaLN-single self-attn + caption cross-attn + MLP.

    Spec: PixArtMSBlock (PixArtMS.py:49-79) == PixArtBlock (PixArt.py:25-56);
    per-block learned scale_shift_table [6, D] added to the shared t0.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    sampling: Optional[str] = None
    sr_ratio: int = 1
    qk_norm: bool = False
    fp32_attention: bool = False
    attn_impl: str = "auto"
    hw: Optional[tuple[int, int]] = None  # static latent grid (h, w)
    quant: bool = False  # int8 projection/MLP matmuls (serving mode)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, D]
        y: jnp.ndarray,  # [B, L, D]
        t0: jnp.ndarray,  # [B, 6*D]
        y_mask: Optional[jnp.ndarray] = None,  # [B, L]
        cross_kv: Optional[jnp.ndarray] = None,  # [B, L, 2D] hoisted K/V
    ) -> jnp.ndarray:
        # sequence parallelism: re-pin the token dim to the ambient 'seq'
        # mesh axis at every block boundary (no-op without such a mesh)
        x = seq_constraint(x)
        B, N, D = x.shape
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=self.hidden_size**-0.5),
            (6, self.hidden_size),
        )
        mods = table[None].astype(self.dtype) + t0.reshape(B, 6, D).astype(self.dtype)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i : i + 1] for i in range(6)
        )
        norm1 = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm1",
        )(x)
        attn_out = SelfAttentionKVCompress(
            dim=D,
            num_heads=self.num_heads,
            sampling=self.sampling,
            sr_ratio=self.sr_ratio,
            qk_norm=self.qk_norm,
            fp32_attention=self.fp32_attention,
            attn_impl=self.attn_impl,
            hw=self.hw,
            quant=self.quant,
            dtype=self.dtype,
            name="attn",
        )(t2i_modulate(norm1, shift_msa, scale_msa))
        # named residuals so remat_policy='save_attn' can keep exactly the
        # attention outputs (N*D each — the expensive-to-recompute part)
        # while rematerialising everything else (models/pixart.py)
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = x + gate_msa * attn_out
        cross_out = MultiHeadCrossAttention(
            dim=D,
            num_heads=self.num_heads,
            fp32_attention=self.fp32_attention,
            attn_impl=self.attn_impl,
            quant=self.quant,
            dtype=self.dtype,
            name="cross_attn",
        )(x, y, y_mask, kv=cross_kv)
        x = x + checkpoint_name(cross_out, "cross_out")
        norm2 = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm2",
        )(x)
        x = x + gate_mlp * Mlp(
            hidden_features=int(D * self.mlp_ratio),
            out_features=D,
            quant=self.quant,
            dtype=self.dtype,
            name="mlp",
        )(t2i_modulate(norm2, shift_mlp, scale_mlp))
        return x


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray):
    """Classic DiT adaLN modulation with [B, D] shift/scale broadcast over
    tokens (PixArt_blocks.py:20-21)."""
    return x * (1 + scale[:, None]) + shift[:, None]


class FinalLayer(nn.Module):
    """DiT final layer with per-sample adaLN (PixArt_blocks.py:184-202).

    Unlike T2IFinalLayer's shared scale_shift_table, this derives shift/scale
    from the conditioning vector through a SiLU+Dense head.
    """

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mods = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype, kernel_init=xavier,
            name="adaLN_modulation",
        )(nn.silu(c.astype(self.dtype)))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm_final",
        )(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, kernel_init=xavier, name="linear",
        )(x)


class MaskFinalLayer(nn.Module):
    """Final layer for masked-token decoding (PixArt_blocks.py:224-239):
    conditioning width may differ from the feature width."""

    final_hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        mods = nn.Dense(
            2 * self.final_hidden_size, dtype=self.dtype, kernel_init=xavier,
            name="adaLN_modulation",
        )(nn.silu(t.astype(self.dtype)))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm_final",
        )(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, kernel_init=xavier, name="linear",
        )(x)


class DecoderLayer(nn.Module):
    """adaLN-modulated projection into a decoder width
    (PixArt_blocks.py:242-257), used by MAE-style masked training heads."""

    hidden_size: int
    decoder_hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        mods = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype, kernel_init=xavier,
            name="adaLN_modulation",
        )(nn.silu(t.astype(self.dtype)))
        shift, scale = jnp.split(mods, 2, axis=-1)
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm_decoder",
        )(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.decoder_hidden_size, dtype=self.dtype, kernel_init=xavier,
            name="linear",
        )(x)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG label dropout (PixArt_blocks.py:348-378).

    Row num_classes is the learned null class used when a label is dropped
    (rng collection 'label_drop', or forced via force_drop_ids).
    """

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        labels: jnp.ndarray,  # [B] int
        train: bool = False,
        force_drop_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        use_cfg = int(self.dropout_prob > 0)
        table = nn.Embed(
            self.num_classes + use_cfg, self.hidden_size,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, name="embedding_table",
        )
        if (train and self.dropout_prob > 0) or force_drop_ids is not None:
            if self.dropout_prob <= 0:
                # no null row exists in the table; XLA would clamp the OOB
                # gather and silently map drops to the last real class
                raise ValueError(
                    "force_drop_ids requires dropout_prob > 0 (the null-class "
                    "embedding row only exists when CFG dropout is enabled)"
                )
            if force_drop_ids is None:
                rng = self.make_rng("label_drop")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


class CaptionEmbedderDoubleBr(nn.Module):
    """Double-branch caption embedder (PixArt_blocks.py:410-441): a global
    (token-mean) projected embedding plus the per-token caption, each with its
    own learned null replaced under CFG dropout."""

    in_channels: int
    hidden_size: int
    uncond_prob: float = 0.1
    token_num: int = 120
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        caption: jnp.ndarray,  # [B, 1, L, in_channels] or [B, L, in_channels]
        train: bool = False,
        force_drop_ids: Optional[jnp.ndarray] = None,
    ):
        if caption.ndim == 3:
            caption = caption[:, None]
        init10 = nn.initializers.normal(stddev=10**-0.5)
        global_null = self.param("embedding", init10, (1, self.in_channels))
        y_embedding = self.param(
            "y_embedding", init10, (self.token_num, self.in_channels)
        )
        global_caption = caption.mean(axis=2).reshape(caption.shape[0], -1)
        if (train and self.uncond_prob > 0) or force_drop_ids is not None:
            if force_drop_ids is None:
                rng = self.make_rng("caption_drop")
                drop = (
                    jax.random.uniform(rng, (caption.shape[0],)) < self.uncond_prob
                )
            else:
                drop = force_drop_ids == 1
            global_caption = jnp.where(
                drop[:, None], global_null.astype(global_caption.dtype),
                global_caption,
            )
            caption = jnp.where(
                drop[:, None, None, None], y_embedding.astype(caption.dtype),
                caption,
            )
        y_embed = Mlp(
            hidden_features=self.hidden_size,
            out_features=self.hidden_size,
            dtype=self.dtype,
            kernel_init=normal02,
            name="proj",
        )(global_caption.astype(self.dtype))
        return y_embed, caption
