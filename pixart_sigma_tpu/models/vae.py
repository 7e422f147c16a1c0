"""AutoencoderKL (SD/SDXL VAE) in flax, with tiled 2K/4K decode.

Spec: the reference consumes diffusers' AutoencoderKL
(/root/reference/train_scripts/train.py:352-354, scripts/inference.py:191-202,
scale factor 0.13025 for SDXL / 0.18215 for SD1.5 —
configs/PixArt_xl2_internal.py:58). This is a from-scratch NHWC flax
implementation of the standard architecture (conv_in, 4 down blocks of 2
resnets, attention mid block, mirrored decoder with 3-resnet up blocks,
GroupNorm(32)+SiLU), plus a converter from diffusers torch state-dicts.

TPU-first: channel-last convs (XLA:TPU native layout), fp32 GroupNorm, bf16
convs optional, and a tiled decoder with blended overlaps so 4K decode fits
in HBM (the reference has no 4K decode path at all — SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025  # SDXL; SD1.5 uses 0.18215
    dtype: Any = jnp.float32

    @classmethod
    def sdxl(cls, **kw) -> "VAEConfig":
        return cls(**kw)

    @classmethod
    def small_test(cls, **kw) -> "VAEConfig":
        base = dict(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4)
        base.update(kw)
        return cls(**base)


def _conv(features, kernel=3, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((kernel // 2, kernel // 2),) * 2 if kernel > 1 else "VALID",
        dtype=dtype,
        name=name,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm1")(x)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm2")(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, kernel=1, dtype=self.dtype,
                      name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over the mid block (512 ch)."""

    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * (C**-0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        h = jnp.einsum("bnm,bmc->bnc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ch = cfg.block_out_channels
        h = _conv(ch[0], dtype=cfg.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    c, cfg.norm_num_groups, cfg.dtype, name=f"down_{i}_res_{j}"
                )(h)
            if i < len(ch) - 1:
                # diffusers: stride-2 conv with manual (0,1)x(0,1) padding
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding="VALID", dtype=cfg.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        h = ResnetBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = _conv(2 * cfg.latent_channels, dtype=cfg.dtype, name="conv_out")(
            nn.silu(h)
        )
        return h  # [B, H/8, W/8, 2*latent]


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.block_out_channels
        h = _conv(ch[-1], dtype=cfg.dtype, name="conv_in")(z)
        h = ResnetBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_res_0")(h)
        h = AttnBlock(cfg.norm_num_groups, cfg.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch[-1], cfg.norm_num_groups, cfg.dtype, name="mid_res_1")(h)
        for i, c in enumerate(reversed(ch)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    c, cfg.norm_num_groups, cfg.dtype, name=f"up_{i}_res_{j}"
                )(h)
            if i < len(ch) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = _conv(c, dtype=cfg.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = _conv(cfg.in_channels, dtype=cfg.dtype, name="conv_out")(nn.silu(h))
        return h


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode latent -> image. NHWC throughout."""

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = _conv(
            2 * self.cfg.latent_channels, kernel=1, dtype=self.cfg.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = _conv(
            self.cfg.latent_channels, kernel=1, dtype=self.cfg.dtype,
            name="post_quant_conv",
        )

    def encode(self, x):
        """[B, H, W, 3] in [-1,1] -> (mean, logvar) each [B, H/8, W/8, 4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """[B, h, w, 4] (UNSCALED latent) -> [B, 8h, 8w, 3]."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )
        return self.decode(z), mean, logvar


# ---------------------------------------------------------------------------
# tiled decode (4K-capable; the reference stops at 2K)
# ---------------------------------------------------------------------------

def make_tiled_decode(decode_fn, tile: int = 64, overlap: int = 16):
    """On-device tiled decoder: ONE jitted program scanning over tiles.

    The host-loop variant (`tiled_decode` below) pays a dispatch round trip
    per tile — on the tunneled v5e worker that is ~0.25 s each, so a 2K
    decode (25 tiles) cost 7.3 s when the tile compute itself is ~0.9 s
    total. Here tile slicing, decode and overlap blending all run inside one
    lax.scan, so dispatch is paid once: measured 2K 7.3 -> ~1 s/img. HBM
    stays bounded by one tile's decoder activations + the fp32 output
    canvas (200 MB at 4K).

    `decode_fn(z_tile)` must be traceable ([N, tile, tile, C] -> images).
    Returns a jitted callable `run(z) -> [B, h*f, w*f, out_c]` that also
    handles the no-tiling case (z smaller than one tile).
    """
    stride = tile - overlap

    @jax.jit
    def run(z):
        B, h, w, C = z.shape
        if h <= tile and w <= tile:
            return decode_fn(z)
        ys = list(range(0, max(h - overlap, 1), stride))
        xs = list(range(0, max(w - overlap, 1), stride))
        spans = []
        for y0 in ys:
            for x0 in xs:
                y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
                spans.append((max(0, y1 - tile), max(0, x1 - tile)))
        starts = jnp.asarray(spans, jnp.int32)  # [T, 2] (all tiles full-size)
        out_sh = jax.eval_shape(
            decode_fn, jax.ShapeDtypeStruct((B, tile, tile, C), z.dtype)
        )
        f = out_sh.shape[1] // tile
        oc = out_sh.shape[-1]
        ramp = min(overlap * f, tile * f)
        tf = tile * f

        def prof(fade_lo, fade_hi):
            # traced twin of _blend_profile: min(1, (i+.5)/ramp) ramps
            idx = jnp.arange(tf, dtype=jnp.float32)
            p = jnp.ones(tf, jnp.float32)
            if ramp > 1:
                p = jnp.minimum(
                    p, jnp.where(fade_lo, (idx + 0.5) / ramp, 1.0)
                )
                p = jnp.minimum(
                    p, jnp.where(fade_hi, (tf - 0.5 - idx) / ramp, 1.0)
                )
            return p

        def body(carry, start):
            out, wsum = carry
            y0, x0 = start[0], start[1]
            zt = jax.lax.dynamic_slice(z, (0, y0, x0, 0), (B, tile, tile, C))
            dec = decode_fn(zt).astype(jnp.float32)
            wy = prof(y0 > 0, y0 + tile < h)
            wx = prof(x0 > 0, x0 + tile < w)
            wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
            oy, ox = y0 * f, x0 * f
            cur = jax.lax.dynamic_slice(out, (0, oy, ox, 0), (B, tf, tf, oc))
            out = jax.lax.dynamic_update_slice(
                out, cur + dec * wmap, (0, oy, ox, 0)
            )
            curw = jax.lax.dynamic_slice(wsum, (0, oy, ox, 0), (1, tf, tf, 1))
            wsum = jax.lax.dynamic_update_slice(
                wsum, curw + wmap, (0, oy, ox, 0)
            )
            return (out, wsum), None

        out0 = jnp.zeros((B, h * f, w * f, oc), jnp.float32)
        w0 = jnp.zeros((1, h * f, w * f, 1), jnp.float32)
        (out, wsum), _ = jax.lax.scan(body, (out0, w0), starts)
        return out / jnp.maximum(wsum, 1e-8)

    return run


def tiled_decode(
    apply_decode,
    z: jnp.ndarray,
    tile: int = 64,
    overlap: int = 16,
) -> jnp.ndarray:
    """Decode latents tile-by-tile with linear blending on the overlaps.

    `apply_decode(z_tile)` decodes [N, tile, tile, 4] latent tiles (any N).
    Interior tiles are all exactly (tile, tile), so they are BATCHED into
    chunked decode calls (amortises dispatch latency ~3x on 4K), while HBM
    stays bounded by `batch_tiles` tiles' activations.
    """
    B, h, w, C = z.shape
    if h <= tile and w <= tile:
        return apply_decode(z)
    stride = tile - overlap
    batch_tiles = 1  # >1 thrashes HBM (4 GB activations per 1024px tile)

    spans = []
    ys = list(range(0, max(h - overlap, 1), stride))
    xs = list(range(0, max(w - overlap, 1), stride))
    for y0 in ys:
        for x0 in xs:
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            spans.append((max(0, y1 - tile), max(0, x1 - tile), y1, x1))

    # gather all tiles [n_tiles*B, tile, tile, C] and decode in chunks
    tiles = jnp.concatenate(
        [z[:, y0a:y1, x0a:x1] for (y0a, x0a, y1, x1) in spans], axis=0
    )
    decoded = []
    for i in range(0, tiles.shape[0], batch_tiles * B):
        decoded.append(
            np.asarray(apply_decode(tiles[i : i + batch_tiles * B]), np.float32)
        )
    decoded = np.concatenate(decoded, axis=0)

    f = decoded.shape[1] // tile  # spatial upscale factor (8 for SDXL)
    out = np.zeros((B, h * f, w * f, decoded.shape[-1]), dtype=np.float32)
    weight = np.zeros((1, h * f, w * f, 1), dtype=np.float32)
    for idx, (y0a, x0a, y1, x1) in enumerate(spans):
        dec = decoded[idx * B : (idx + 1) * B]
        th, tw = dec.shape[1], dec.shape[2]
        wy = _blend_profile(th, (y0a > 0), (y1 < h), overlap * f)
        wx = _blend_profile(tw, (x0a > 0), (x1 < w), overlap * f)
        wmap = wy[:, None] * wx[None, :]
        out[:, y0a * f : y1 * f, x0a * f : x1 * f] += dec * wmap[None, :, :, None]
        weight[:, y0a * f : y1 * f, x0a * f : x1 * f] += wmap[None, :, :, None]
    return jnp.asarray(out / np.maximum(weight, 1e-8))


def _blend_profile(size: int, fade_lo: bool, fade_hi: bool, ramp: int) -> np.ndarray:
    prof = np.ones(size, dtype=np.float32)
    ramp = min(ramp, size)
    if ramp > 1:
        lin = np.linspace(0.0, 1.0, ramp, endpoint=False) + 0.5 / ramp
        if fade_lo:
            prof[:ramp] = np.minimum(prof[:ramp], lin)
        if fade_hi:
            prof[-ramp:] = np.minimum(prof[-ramp:], lin[::-1])
    return prof


# ---------------------------------------------------------------------------
# diffusers torch state-dict -> flax
# ---------------------------------------------------------------------------

def _t_conv(sd, name):
    """torch Conv2d [O, I, kh, kw] -> flax Conv {kernel [kh, kw, I, O], bias}."""
    return {
        "kernel": np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _t_gn(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _t_lin(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    if w.ndim == 4:  # old ckpts store attention projs as 1x1 convs
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": np.asarray(sd[f"{name}.bias"])}


def diffusers_vae_to_flax(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict[str, Any]:
    """Map diffusers AutoencoderKL keys to our module tree."""
    n_blocks = len(cfg.block_out_channels)

    def resnet(prefix):
        out = {
            "norm1": _t_gn(sd, f"{prefix}.norm1"),
            "conv1": _t_conv(sd, f"{prefix}.conv1"),
            "norm2": _t_gn(sd, f"{prefix}.norm2"),
            "conv2": _t_conv(sd, f"{prefix}.conv2"),
        }
        if f"{prefix}.conv_shortcut.weight" in sd:
            out["conv_shortcut"] = _t_conv(sd, f"{prefix}.conv_shortcut")
        return out

    def attn(prefix):
        return {
            "norm": _t_gn(sd, f"{prefix}.group_norm"),
            "to_q": _t_lin(sd, f"{prefix}.to_q"),
            "to_k": _t_lin(sd, f"{prefix}.to_k"),
            "to_v": _t_lin(sd, f"{prefix}.to_v"),
            "to_out": _t_lin(sd, f"{prefix}.to_out.0"),
        }

    enc: Dict[str, Any] = {"conv_in": _t_conv(sd, "encoder.conv_in")}
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = resnet(f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            enc[f"down_{i}_downsample"] = _t_conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid_res_0"] = resnet("encoder.mid_block.resnets.0")
    enc["mid_attn"] = attn("encoder.mid_block.attentions.0")
    enc["mid_res_1"] = resnet("encoder.mid_block.resnets.1")
    enc["conv_norm_out"] = _t_gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _t_conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _t_conv(sd, "decoder.conv_in")}
    dec["mid_res_0"] = resnet("decoder.mid_block.resnets.0")
    dec["mid_attn"] = attn("decoder.mid_block.attentions.0")
    dec["mid_res_1"] = resnet("decoder.mid_block.resnets.1")
    for i in range(n_blocks):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = resnet(f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n_blocks - 1:
            dec[f"up_{i}_upsample"] = _t_conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    dec["conv_norm_out"] = _t_gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _t_conv(sd, "decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _t_conv(sd, "quant_conv"),
        "post_quant_conv": _t_conv(sd, "post_quant_conv"),
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_flax_vae(path: str) -> Tuple["AutoencoderKL", Dict[str, Any]]:
    """Load a VAE trained by scripts/train_vae.py.

    `path` is the output dir holding vae_params.msgpack + vae_config.json.
    Returns (module, params) ready for .apply; the counterpart loader for
    diffusers-pretrained weights is diffusers_vae_to_flax above.
    """
    import json as _json
    import os as _os

    from flax import serialization

    with open(_os.path.join(path, "vae_config.json")) as f:
        raw = _json.load(f)
    raw["block_out_channels"] = tuple(raw["block_out_channels"])
    cfg = VAEConfig(**raw)
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    template = vae.init(rng, jnp.zeros((1, 64, 64, cfg.in_channels)), rng)
    with open(_os.path.join(path, "vae_params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return vae, params
