"""FUNCTIONAL stand-ins for timm/xformers so the reference MODEL runs on CPU.

tests/reference_shim.py installs inert stubs (enough to import the math
modules). This module upgrades the stubs to working implementations of the
small API surface the reference DiT uses — timm's Mlp/PatchEmbed/DropPath/
Attention and xformers' memory_efficient_attention with BlockDiagonalMask —
implemented here from their public semantics with torch sdpa. That lets
end-to-end parity tests run the reference PixArt(MS) forward against ours.
"""

from __future__ import annotations

import sys

import torch
import torch.nn as nn
import torch.nn.functional as F


class Mlp(nn.Module):
    """timm Mlp: fc1 -> act -> fc2 (param names fc1/fc2 match state dicts)."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **kw):
        super().__init__()
        hidden_features = hidden_features or in_features
        out_features = out_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        # act_layer may be a module instance, a class, or a zero-arg factory
        self.act = act_layer if isinstance(act_layer, nn.Module) else act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class PatchEmbed(nn.Module):
    """timm PatchEmbed (positional args: img_size, patch_size, in_chans, dim)."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                 norm_layer=None, flatten=True, bias=True):
        super().__init__()
        self.patch_size = (patch_size, patch_size)
        self.num_patches = (img_size // patch_size) ** 2
        self.flatten = flatten
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)
        return x


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return x  # eval-mode identity


class Attention(nn.Module):
    """timm vision_transformer.Attention base (what AttentionKVCompress extends)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0, **kw):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)


class BlockDiagonalMask:
    """xformers BlockDiagonalMask: queries of block i attend keys of block i."""

    def __init__(self, q_seqlen, kv_seqlen):
        self.q_seqlen = list(q_seqlen)
        self.kv_seqlen = list(kv_seqlen)

    @classmethod
    def from_seqlens(cls, q_seqlen, kv_seqlen=None):
        return cls(q_seqlen, kv_seqlen if kv_seqlen is not None else q_seqlen)

    def materialize(self, n_q, n_kv, dtype):
        mask = torch.full((n_q, n_kv), float("-inf"), dtype=dtype)
        q0 = kv0 = 0
        for ql, kl in zip(self.q_seqlen, self.kv_seqlen):
            mask[q0 : q0 + ql, kv0 : kv0 + kl] = 0.0
            q0 += ql
            kv0 += kl
        return mask


def memory_efficient_attention(q, k, v, p=0.0, attn_bias=None):
    """xformers semantics: inputs [B, L, H, D]; additive bias or block mask."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    qt = q.transpose(1, 2).float()
    kt = k.transpose(1, 2).float()
    vt = v.transpose(1, 2).float()
    mask = None
    if isinstance(attn_bias, BlockDiagonalMask):
        mask = attn_bias.materialize(Lq, Lk, qt.dtype)
    elif attn_bias is not None:
        mask = attn_bias.float()
        if mask.ndim == 3:  # [B*H, Lq, Lk] -> [B, H, Lq, Lk]
            mask = mask.reshape(B, H, Lq, Lk)
    out = F.scaled_dot_product_attention(qt, kt, vt, attn_mask=mask)
    return out.transpose(1, 2).to(q.dtype)


def upgrade_stubs() -> None:
    """Swap the inert import stubs for these functional implementations."""
    from tests.reference_shim import install_reference

    install_reference()
    # reference model classes bind Mlp/Attention at class-definition time;
    # purge any already-imported reference modules so they rebuild against
    # the functional stand-ins (matters when other tests imported them first)
    for name in [m for m in sys.modules if m.startswith("diffusion")]:
        del sys.modules[name]
    sys.modules["timm.models.vision_transformer"].Mlp = Mlp
    sys.modules["timm.models.vision_transformer"].PatchEmbed = PatchEmbed
    sys.modules["timm.models.vision_transformer"].Attention = Attention
    sys.modules["timm.models.layers"].DropPath = DropPath
    ops = sys.modules["xformers.ops"]
    ops.memory_efficient_attention = memory_efficient_attention
    fmha = sys.modules["xformers.ops.fmha"]
    fmha.attn_bias = sys.modules["xformers.ops.fmha.attn_bias"]
    sys.modules["xformers.ops.fmha.attn_bias"].BlockDiagonalMask = BlockDiagonalMask
    fmha.BlockDiagonalMask = BlockDiagonalMask
    ops.fmha = fmha
    # `import xformers.ops` binds the attr on the parent package too
    sys.modules["xformers"].ops = ops
