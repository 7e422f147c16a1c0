"""T5 encoder (v1.1 / XXL flavour) in flax + the PixArt T5Embedder facade.

Spec: /root/reference/diffusion/model/t5.py — T5-XXL via HF transformers with
DeepFloyd caption cleaning, 120/300-token padding. This is a from-scratch
flax encoder (RMSNorm, relative-position-bias attention, gated-GELU FFN)
matching google/t5-v1_1-xxl semantics, with a loader for HF torch weights.

TPU-first: bf16 compute / fp32 norms+bias, one jitted forward per static
sequence length (120/300), batched MXU matmuls throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16

    @classmethod
    def xxl(cls, **kw) -> "T5Config":
        return cls(**kw)

    @classmethod
    def small_test(cls, **kw) -> "T5Config":
        base = dict(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, dtype=jnp.float32,
        )
        base.update(kw)
        return cls(**base)


class T5LayerNorm(nn.Module):
    """RMSNorm without bias/mean-subtraction (T5 style), fp32 accumulation."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        return (x * scale).astype(self.dtype)


def relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (host-side, static)."""
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)
    max_exact = n // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    ret += np.where(is_small, rp, large)
    return ret


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias: bool  # only layer 0 owns the relative position bias table

    @nn.compact
    def __call__(self, x, mask, pos_bias=None):
        cfg = self.cfg
        B, L, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=cfg.dtype, name=name
        )
        q = dense("q")(x).reshape(B, L, cfg.num_heads, cfg.d_kv)
        k = dense("k")(x).reshape(B, L, cfg.num_heads, cfg.d_kv)
        v = dense("v")(x).reshape(B, L, cfg.num_heads, cfg.d_kv)

        if self.has_bias:
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            pos = np.arange(L)
            buckets = relative_position_bucket(
                pos[None, :] - pos[:, None],
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )  # [L, L] static
            pos_bias = jnp.take(table, jnp.asarray(buckets), axis=0)  # [L, L, H]
            pos_bias = pos_bias.transpose(2, 0, 1)[None]  # [1, H, L, L]

        # NOTE: T5 does NOT scale by 1/sqrt(d_kv)
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        logits = logits + pos_bias.astype(jnp.float32)
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, inner)
        return nn.Dense(
            cfg.d_model, use_bias=False, dtype=cfg.dtype, name="o"
        )(out), pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_bias: bool

    @nn.compact
    def __call__(self, x, mask, pos_bias=None):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln_attn")(x)
        attn_out, pos_bias = T5Attention(
            cfg, has_bias=self.has_bias, name="attn"
        )(h, mask, pos_bias)
        x = x + attn_out
        h = T5LayerNorm(cfg.layer_norm_epsilon, cfg.dtype, name="ln_ff")(x)
        # gated-GELU FFN (T5 v1.1)
        wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(h)
        wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(h)
        return x, pos_bias


class T5Encoder(nn.Module):
    """Returns final hidden states [B, L, d_model] (the PixArt conditioning)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray):
        cfg = self.cfg
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model),
        )
        x = jnp.take(emb, input_ids, axis=0).astype(cfg.dtype)
        mask = attention_mask.astype(bool)
        pos_bias = None
        for i in range(cfg.num_layers):
            x, pos_bias = T5Block(
                cfg, has_bias=(i == 0), name=f"block_{i}"
            )(x, mask, pos_bias)
        x = T5LayerNorm(cfg.layer_norm_epsilon, cfg.dtype, name="final_ln")(x)
        return x


# ---------------------------------------------------------------------------
# HF torch checkpoint -> flax params
# ---------------------------------------------------------------------------

def hf_t5_to_flax(sd: Dict[str, np.ndarray], cfg: T5Config) -> Dict[str, Any]:
    """Map a HF T5EncoderModel state-dict (torch naming) to our tree."""

    def g(name):
        return np.asarray(sd[name])

    p: Dict[str, Any] = {
        "token_embedding": g("shared.weight"),
        "final_ln": {"weight": g("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blk: Dict[str, Any] = {
            "ln_attn": {"weight": g(f"{b}.layer.0.layer_norm.weight")},
            "attn": {
                "q": {"kernel": g(f"{b}.layer.0.SelfAttention.q.weight").T},
                "k": {"kernel": g(f"{b}.layer.0.SelfAttention.k.weight").T},
                "v": {"kernel": g(f"{b}.layer.0.SelfAttention.v.weight").T},
                "o": {"kernel": g(f"{b}.layer.0.SelfAttention.o.weight").T},
            },
            "ln_ff": {"weight": g(f"{b}.layer.1.layer_norm.weight")},
            "wi_0": {"kernel": g(f"{b}.layer.1.DenseReluDense.wi_0.weight").T},
            "wi_1": {"kernel": g(f"{b}.layer.1.DenseReluDense.wi_1.weight").T},
            "wo": {"kernel": g(f"{b}.layer.1.DenseReluDense.wo.weight").T},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = g(
                f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"
            )
        p[f"block_{i}"] = blk
    return jax.tree_util.tree_map(jnp.asarray, p)


class T5Embedder:
    """PixArt-facing facade: tokenize + encode to [B, L, 4096] + mask.

    Spec: /root/reference/diffusion/model/t5.py:13-233 (the get_text_embeddings
    path with model_max_length 120/300 padding).
    """

    def __init__(
        self,
        params,
        cfg: T5Config,
        tokenizer,
        model_max_length: int = 300,
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.model_max_length = model_max_length
        self.encoder = T5Encoder(cfg)
        self._encode = jax.jit(
            lambda params, ids, mask: self.encoder.apply(
                {"params": params}, ids, mask
            )
        )

    @classmethod
    def from_pretrained(
        cls,
        path: str,
        model_max_length: int = 300,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
        config: "Optional[T5Config]" = None,
    ) -> "T5Embedder":
        """Load tokenizer + torch weights from a local HF checkpoint dir.

        Params are stored in bf16 by default: T5-XXL is 4.7B params and must
        fit next to the DiT in 16 GB HBM (fp32 params alone would be 19 GB).
        `config` overrides the architecture (default T5-XXL) — used by the
        dry-run coverage test with a toy checkpoint+tokenizer dir.
        """
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(path)
        sd = _load_hf_state_dict(path)
        cfg = config if config is not None else T5Config.xxl(dtype=dtype)
        params = hf_t5_to_flax(sd, cfg)
        if param_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(param_dtype), params
            )
        return cls(params, cfg, tokenizer, model_max_length)

    def get_text_embeddings(self, texts):
        from pixart_sigma_tpu.utils.prompt import clean_caption

        texts = [clean_caption(t) for t in texts]
        enc = self.tokenizer(
            texts,
            max_length=self.model_max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])
        return self._encode(self.params, ids, mask), mask


class PseudoT5Embedder:
    """Deterministic hash-embedding text encoder (offline toy pipeline).

    Bit-identical to tools/make_toy_dataset.py's --pseudo-t5 features: each
    word maps to a fixed unit-variance fp16 vector seeded by a stable hash,
    padded to model_max_length. A DiT trained on that dataset can then be
    sampled from free-form captions with no T5 weights on disk — this is the
    text-encoder leg of the air-gapped train -> sample -> decode loop
    (reference toy workflow: README.md:120-146).
    """

    def __init__(self, dim: int = 64, model_max_length: int = 12):
        self.dim = dim
        self.model_max_length = model_max_length

    def get_text_embeddings(self, texts):
        import hashlib

        B, L = len(texts), self.model_max_length
        y = np.zeros((B, L, self.dim), np.float32)
        mask = np.zeros((B, L), np.int32)
        for i, text in enumerate(texts):
            words = text.split()[:L]
            for j, w in enumerate(words):
                seed = int.from_bytes(
                    hashlib.sha256(w.encode()).digest()[:4], "little")
                y[i, j] = np.random.RandomState(seed).randn(
                    self.dim).astype(np.float16)
                mask[i, j] = 1
        return jnp.asarray(y), jnp.asarray(mask)


def _load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    import os

    from pixart_sigma_tpu.utils.checkpoint import load_safetensors_state_dict

    st = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st:
        return load_safetensors_state_dict(path)
    import torch

    sd: Dict[str, np.ndarray] = {}
    for f in sorted(os.listdir(path)):
        if f.endswith(".bin"):
            part = torch.load(
                os.path.join(path, f), map_location="cpu", weights_only=False
            )
            sd.update({k: v.float().numpy() for k, v in part.items()})
    assert sd, f"no weights found under {path}"
    return sd
