"""Checkpoint interop: reference .pth / diffusers <-> flax params, orbax state.

Specs:
- .pth schema: /root/reference/diffusion/utils/checkpoint.py (save :8-37,
  load :40-84 — strips pos_embed, injects the null-caption embedding)
- .pth <-> diffusers key map: /root/reference/tools/convert_pixart_to_diffusers.py:29-156
  (qkv chunking, t_block -> adaln_single.linear, etc.)

Our native training checkpoints are orbax (sharding-aware, async-capable);
these converters exist so reference users can bring every released PixArt
checkpoint (both dialects) and export back.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.utils.param_layout import (
    stack_block_params,
    unstack_block_params,
)


# --------------------------------------------------------------------------
# torch .pth  ->  flax
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth into numpy (handles the {'state_dict': ...} wrapper)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.float().numpy() for k, v in ckpt.items()}


def _dense(sd, name):
    """torch Linear -> flax Dense params."""
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _ln(sd, name):
    """torch LayerNorm -> flax LayerNorm params."""
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


class _TrackingDict(dict):
    """dict that records every key read — backs strict load checking."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used: set = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.used.add(k)
        return super().get(k, default)


def torch_to_flax_params(
    sd: Dict[str, np.ndarray],
    cfg,
    null_embedding: Optional[np.ndarray] = None,
    strict: bool = False,
) -> Dict[str, Any]:
    """Reference .pth state-dict -> our flax param tree.

    pos_embed buffers are dropped (resolution-dependent, recomputed at trace
    time); `null_embedding` optionally replaces y_embedder.y_embedding, like
    the reference's load_checkpoint (checkpoint.py:62-68). `strict=True`
    raises if any checkpoint key was neither consumed nor a known-dropped
    buffer (the torch load_state_dict(strict=True) analogue; used by
    tools/validate_released.py and the key-manifest tests).
    """
    sd = _TrackingDict(sd)
    for k in ("pos_embed", "base_model.pos_embed", "model.pos_embed"):
        sd.pop(k, None)

    p = cfg.patch_size
    D = cfg.hidden_size
    params: Dict[str, Any] = {}

    # PatchEmbed: conv [D, C, p, p] -> dense [(p, q, c) x D]
    w = sd["x_embedder.proj.weight"]
    params["x_embedder"] = {
        "proj": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(-1, D),
            "bias": sd["x_embedder.proj.bias"],
        }
    }
    params["t_embedder"] = {
        "fc1": _dense(sd, "t_embedder.mlp.0"),
        "fc2": _dense(sd, "t_embedder.mlp.2"),
    }
    params["t_block"] = _dense(sd, "t_block.1")
    if "csize_embedder.mlp.0.weight" in sd:
        params["csize_embedder"] = {
            "fc1": _dense(sd, "csize_embedder.mlp.0"),
            "fc2": _dense(sd, "csize_embedder.mlp.2"),
        }
        params["ar_embedder"] = {
            "fc1": _dense(sd, "ar_embedder.mlp.0"),
            "fc2": _dense(sd, "ar_embedder.mlp.2"),
        }
    y_embedding = sd.get("y_embedder.y_embedding")
    if null_embedding is not None:
        y_embedding = np.asarray(null_embedding)
    assert y_embedding is not None, (
        "no y_embedder.y_embedding in checkpoint; pass null_embedding="
    )
    params["y_embedder"] = {
        "y_embedding": y_embedding,
        "y_proj": {
            "fc1": _dense(sd, "y_embedder.y_proj.fc1"),
            "fc2": _dense(sd, "y_embedder.y_proj.fc2"),
        },
    }

    for i in range(cfg.depth):
        b = f"blocks.{i}"
        blk: Dict[str, Any] = {
            "scale_shift_table": sd[f"{b}.scale_shift_table"],
            "attn": {
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
            },
            "cross_attn": {
                "q_linear": _dense(sd, f"{b}.cross_attn.q_linear"),
                "kv_linear": _dense(sd, f"{b}.cross_attn.kv_linear"),
                "proj": _dense(sd, f"{b}.cross_attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            },
        }
        if f"{b}.attn.q_norm.weight" in sd:
            blk["attn"]["q_norm"] = _ln(sd, f"{b}.attn.q_norm")
            blk["attn"]["k_norm"] = _ln(sd, f"{b}.attn.k_norm")
        if f"{b}.attn.sr.weight" in sd:
            # depthwise conv [C, 1, sr, sr] -> HWIO [sr, sr, 1, C]
            blk["attn"]["sr_kernel"] = sd[f"{b}.attn.sr.weight"].transpose(2, 3, 1, 0)
            blk["attn"]["sr_bias"] = sd[f"{b}.attn.sr.bias"]
            blk["attn"]["sr_norm"] = _ln(sd, f"{b}.attn.norm")
        params[f"blocks_{i}"] = blk

    params["final_layer"] = {
        "scale_shift_table": sd["final_layer.scale_shift_table"],
        "linear": _dense(sd, "final_layer.linear"),
    }
    if strict:
        leftover = set(sd) - sd.used
        if leftover:
            raise ValueError(
                f"{len(leftover)} checkpoint keys not consumed by the model "
                f"config (first 8): {sorted(leftover)[:8]}"
            )
    if cfg.scan_blocks:
        params = stack_block_params(params, cfg)
    return jax.tree_util.tree_map(jnp.asarray, params)


# --------------------------------------------------------------------------
# flax -> torch .pth
# --------------------------------------------------------------------------

def flax_to_torch_state_dict(params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Our flax param tree -> reference .pth naming (for export/interop)."""
    params = jax.tree_util.tree_map(np.asarray, params)
    if cfg.scan_blocks and any(k.startswith("blocks_scan_") for k in params):
        params = unstack_block_params(params, cfg)

    sd: Dict[str, np.ndarray] = {}

    def put_dense(name, tree):
        sd[f"{name}.weight"] = tree["kernel"].T
        sd[f"{name}.bias"] = tree["bias"]

    def put_ln(name, tree):
        sd[f"{name}.weight"] = tree["scale"]
        sd[f"{name}.bias"] = tree["bias"]

    p = cfg.patch_size
    D = cfg.hidden_size
    C = cfg.in_channels
    k = params["x_embedder"]["proj"]["kernel"].reshape(p, p, C, D)
    sd["x_embedder.proj.weight"] = k.transpose(3, 2, 0, 1)
    sd["x_embedder.proj.bias"] = params["x_embedder"]["proj"]["bias"]
    put_dense("t_embedder.mlp.0", params["t_embedder"]["fc1"])
    put_dense("t_embedder.mlp.2", params["t_embedder"]["fc2"])
    put_dense("t_block.1", params["t_block"])
    if "csize_embedder" in params:
        put_dense("csize_embedder.mlp.0", params["csize_embedder"]["fc1"])
        put_dense("csize_embedder.mlp.2", params["csize_embedder"]["fc2"])
        put_dense("ar_embedder.mlp.0", params["ar_embedder"]["fc1"])
        put_dense("ar_embedder.mlp.2", params["ar_embedder"]["fc2"])
    sd["y_embedder.y_embedding"] = params["y_embedder"]["y_embedding"]
    put_dense("y_embedder.y_proj.fc1", params["y_embedder"]["y_proj"]["fc1"])
    put_dense("y_embedder.y_proj.fc2", params["y_embedder"]["y_proj"]["fc2"])

    for i in range(cfg.depth):
        blk = params[f"blocks_{i}"]
        b = f"blocks.{i}"
        sd[f"{b}.scale_shift_table"] = blk["scale_shift_table"]
        put_dense(f"{b}.attn.qkv", blk["attn"]["qkv"])
        put_dense(f"{b}.attn.proj", blk["attn"]["proj"])
        if "q_norm" in blk["attn"]:
            put_ln(f"{b}.attn.q_norm", blk["attn"]["q_norm"])
            put_ln(f"{b}.attn.k_norm", blk["attn"]["k_norm"])
        if "sr_kernel" in blk["attn"]:
            sd[f"{b}.attn.sr.weight"] = blk["attn"]["sr_kernel"].transpose(3, 2, 0, 1)
            sd[f"{b}.attn.sr.bias"] = blk["attn"]["sr_bias"]
            put_ln(f"{b}.attn.norm", blk["attn"]["sr_norm"])
        put_dense(f"{b}.cross_attn.q_linear", blk["cross_attn"]["q_linear"])
        put_dense(f"{b}.cross_attn.kv_linear", blk["cross_attn"]["kv_linear"])
        put_dense(f"{b}.cross_attn.proj", blk["cross_attn"]["proj"])
        put_dense(f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        put_dense(f"{b}.mlp.fc2", blk["mlp"]["fc2"])

    sd["final_layer.scale_shift_table"] = params["final_layer"]["scale_shift_table"]
    put_dense("final_layer.linear", params["final_layer"]["linear"])
    return sd


# --------------------------------------------------------------------------
# diffusers transformer state-dict -> flax
# --------------------------------------------------------------------------

def diffusers_to_torch_state_dict(
    dsd: Dict[str, np.ndarray], depth: int = 28
) -> Dict[str, np.ndarray]:
    """Diffusers Transformer2DModel naming -> reference .pth naming.

    Inverse of tools/convert_pixart_to_diffusers.py:29-156 (the map the
    reference defines); lets us ingest HF-format PixArt checkpoints.
    """
    sd: Dict[str, np.ndarray] = {}
    ren = {
        "pos_embed.proj.weight": "x_embedder.proj.weight",
        "pos_embed.proj.bias": "x_embedder.proj.bias",
        "caption_projection.linear_1.weight": "y_embedder.y_proj.fc1.weight",
        "caption_projection.linear_1.bias": "y_embedder.y_proj.fc1.bias",
        "caption_projection.linear_2.weight": "y_embedder.y_proj.fc2.weight",
        "caption_projection.linear_2.bias": "y_embedder.y_proj.fc2.bias",
        "adaln_single.emb.timestep_embedder.linear_1.weight": "t_embedder.mlp.0.weight",
        "adaln_single.emb.timestep_embedder.linear_1.bias": "t_embedder.mlp.0.bias",
        "adaln_single.emb.timestep_embedder.linear_2.weight": "t_embedder.mlp.2.weight",
        "adaln_single.emb.timestep_embedder.linear_2.bias": "t_embedder.mlp.2.bias",
        "adaln_single.emb.resolution_embedder.linear_1.weight": "csize_embedder.mlp.0.weight",
        "adaln_single.emb.resolution_embedder.linear_1.bias": "csize_embedder.mlp.0.bias",
        "adaln_single.emb.resolution_embedder.linear_2.weight": "csize_embedder.mlp.2.weight",
        "adaln_single.emb.resolution_embedder.linear_2.bias": "csize_embedder.mlp.2.bias",
        "adaln_single.emb.aspect_ratio_embedder.linear_1.weight": "ar_embedder.mlp.0.weight",
        "adaln_single.emb.aspect_ratio_embedder.linear_1.bias": "ar_embedder.mlp.0.bias",
        "adaln_single.emb.aspect_ratio_embedder.linear_2.weight": "ar_embedder.mlp.2.weight",
        "adaln_single.emb.aspect_ratio_embedder.linear_2.bias": "ar_embedder.mlp.2.bias",
        "adaln_single.linear.weight": "t_block.1.weight",
        "adaln_single.linear.bias": "t_block.1.bias",
        "proj_out.weight": "final_layer.linear.weight",
        "proj_out.bias": "final_layer.linear.bias",
        "scale_shift_table": "final_layer.scale_shift_table",
        "caption_projection.y_embedding": "y_embedder.y_embedding",
    }
    for src, dst in ren.items():
        if src in dsd:
            sd[dst] = dsd[src]
    for i in range(depth):
        t = f"transformer_blocks.{i}"
        b = f"blocks.{i}"
        sd[f"{b}.scale_shift_table"] = dsd[f"{t}.scale_shift_table"]
        sd[f"{b}.attn.qkv.weight"] = np.concatenate(
            [dsd[f"{t}.attn1.to_{x}.weight"] for x in "qkv"], axis=0
        )
        sd[f"{b}.attn.qkv.bias"] = np.concatenate(
            [dsd[f"{t}.attn1.to_{x}.bias"] for x in "qkv"], axis=0
        )
        sd[f"{b}.attn.proj.weight"] = dsd[f"{t}.attn1.to_out.0.weight"]
        sd[f"{b}.attn.proj.bias"] = dsd[f"{t}.attn1.to_out.0.bias"]
        if f"{t}.attn1.q_norm.weight" in dsd:
            for ours, theirs in (("q_norm", "q_norm"), ("k_norm", "k_norm")):
                sd[f"{b}.attn.{ours}.weight"] = dsd[f"{t}.attn1.{theirs}.weight"]
                sd[f"{b}.attn.{ours}.bias"] = dsd[f"{t}.attn1.{theirs}.bias"]
        sd[f"{b}.cross_attn.q_linear.weight"] = dsd[f"{t}.attn2.to_q.weight"]
        sd[f"{b}.cross_attn.q_linear.bias"] = dsd[f"{t}.attn2.to_q.bias"]
        sd[f"{b}.cross_attn.kv_linear.weight"] = np.concatenate(
            [dsd[f"{t}.attn2.to_k.weight"], dsd[f"{t}.attn2.to_v.weight"]], axis=0
        )
        sd[f"{b}.cross_attn.kv_linear.bias"] = np.concatenate(
            [dsd[f"{t}.attn2.to_k.bias"], dsd[f"{t}.attn2.to_v.bias"]], axis=0
        )
        sd[f"{b}.cross_attn.proj.weight"] = dsd[f"{t}.attn2.to_out.0.weight"]
        sd[f"{b}.cross_attn.proj.bias"] = dsd[f"{t}.attn2.to_out.0.bias"]
        sd[f"{b}.mlp.fc1.weight"] = dsd[f"{t}.ff.net.0.proj.weight"]
        sd[f"{b}.mlp.fc1.bias"] = dsd[f"{t}.ff.net.0.proj.bias"]
        sd[f"{b}.mlp.fc2.weight"] = dsd[f"{t}.ff.net.2.weight"]
        sd[f"{b}.mlp.fc2.bias"] = dsd[f"{t}.ff.net.2.bias"]
    return sd


def torch_to_diffusers_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference .pth naming -> diffusers Transformer2DModel naming.

    Forward direction of tools/convert_pixart_to_diffusers.py:29-156 (qkv
    split into to_q/to_k/to_v, kv_linear into to_k/to_v, embedder renames).
    pos_embed buffers are dropped (diffusers recomputes them).
    """
    dsd = {}
    ren = {
        "x_embedder.proj.weight": "pos_embed.proj.weight",
        "x_embedder.proj.bias": "pos_embed.proj.bias",
        "y_embedder.y_proj.fc1.weight": "caption_projection.linear_1.weight",
        "y_embedder.y_proj.fc1.bias": "caption_projection.linear_1.bias",
        "y_embedder.y_proj.fc2.weight": "caption_projection.linear_2.weight",
        "y_embedder.y_proj.fc2.bias": "caption_projection.linear_2.bias",
        "y_embedder.y_embedding": "caption_projection.y_embedding",
        "t_embedder.mlp.0.weight": "adaln_single.emb.timestep_embedder.linear_1.weight",
        "t_embedder.mlp.0.bias": "adaln_single.emb.timestep_embedder.linear_1.bias",
        "t_embedder.mlp.2.weight": "adaln_single.emb.timestep_embedder.linear_2.weight",
        "t_embedder.mlp.2.bias": "adaln_single.emb.timestep_embedder.linear_2.bias",
        "csize_embedder.mlp.0.weight": "adaln_single.emb.resolution_embedder.linear_1.weight",
        "csize_embedder.mlp.0.bias": "adaln_single.emb.resolution_embedder.linear_1.bias",
        "csize_embedder.mlp.2.weight": "adaln_single.emb.resolution_embedder.linear_2.weight",
        "csize_embedder.mlp.2.bias": "adaln_single.emb.resolution_embedder.linear_2.bias",
        "ar_embedder.mlp.0.weight": "adaln_single.emb.aspect_ratio_embedder.linear_1.weight",
        "ar_embedder.mlp.0.bias": "adaln_single.emb.aspect_ratio_embedder.linear_1.bias",
        "ar_embedder.mlp.2.weight": "adaln_single.emb.aspect_ratio_embedder.linear_2.weight",
        "ar_embedder.mlp.2.bias": "adaln_single.emb.aspect_ratio_embedder.linear_2.bias",
        "t_block.1.weight": "adaln_single.linear.weight",
        "t_block.1.bias": "adaln_single.linear.bias",
        "final_layer.linear.weight": "proj_out.weight",
        "final_layer.linear.bias": "proj_out.bias",
        "final_layer.scale_shift_table": "scale_shift_table",
    }
    for src, dst in ren.items():
        if src in sd:
            dsd[dst] = sd[src]
    depth = max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    ) + 1
    for i in range(depth):
        b, t = f"blocks.{i}", f"transformer_blocks.{i}"
        dsd[f"{t}.scale_shift_table"] = sd[f"{b}.scale_shift_table"]
        for n, part in zip("qkv", np.split(sd[f"{b}.attn.qkv.weight"], 3, axis=0)):
            dsd[f"{t}.attn1.to_{n}.weight"] = part
        for n, part in zip("qkv", np.split(sd[f"{b}.attn.qkv.bias"], 3, axis=0)):
            dsd[f"{t}.attn1.to_{n}.bias"] = part
        dsd[f"{t}.attn1.to_out.0.weight"] = sd[f"{b}.attn.proj.weight"]
        dsd[f"{t}.attn1.to_out.0.bias"] = sd[f"{b}.attn.proj.bias"]
        if f"{b}.attn.q_norm.weight" in sd:
            for n in ("q_norm", "k_norm"):
                dsd[f"{t}.attn1.{n}.weight"] = sd[f"{b}.attn.{n}.weight"]
                dsd[f"{t}.attn1.{n}.bias"] = sd[f"{b}.attn.{n}.bias"]
        dsd[f"{t}.attn2.to_q.weight"] = sd[f"{b}.cross_attn.q_linear.weight"]
        dsd[f"{t}.attn2.to_q.bias"] = sd[f"{b}.cross_attn.q_linear.bias"]
        kw, vw = np.split(sd[f"{b}.cross_attn.kv_linear.weight"], 2, axis=0)
        kb, vb = np.split(sd[f"{b}.cross_attn.kv_linear.bias"], 2, axis=0)
        dsd[f"{t}.attn2.to_k.weight"], dsd[f"{t}.attn2.to_v.weight"] = kw, vw
        dsd[f"{t}.attn2.to_k.bias"], dsd[f"{t}.attn2.to_v.bias"] = kb, vb
        dsd[f"{t}.attn2.to_out.0.weight"] = sd[f"{b}.cross_attn.proj.weight"]
        dsd[f"{t}.attn2.to_out.0.bias"] = sd[f"{b}.cross_attn.proj.bias"]
        dsd[f"{t}.ff.net.0.proj.weight"] = sd[f"{b}.mlp.fc1.weight"]
        dsd[f"{t}.ff.net.0.proj.bias"] = sd[f"{b}.mlp.fc1.bias"]
        dsd[f"{t}.ff.net.2.weight"] = sd[f"{b}.mlp.fc2.weight"]
        dsd[f"{t}.ff.net.2.bias"] = sd[f"{b}.mlp.fc2.bias"]
    return dsd


def load_safetensors_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file (or a diffusers transformer dir) to numpy."""
    from safetensors import safe_open

    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".safetensors")
        )
        assert files, f"no .safetensors under {path}"
        paths = [os.path.join(path, f) for f in files]
    else:
        paths = [path]
    sd: Dict[str, np.ndarray] = {}
    for p in paths:
        with safe_open(p, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k).astype(np.float32)
    return sd


def load_checkpoint(
    path: str,
    cfg,
    load_ema: bool = False,
    null_embedding: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """One-stop loader: .pth (train dialect), diffusers safetensors, or a
    native orbax train-state dir (step_N from save_train_state, or a
    checkpoints/ dir holding them — the latest step is picked)."""
    if os.path.isdir(path) and _is_orbax_dir(path):
        return repartition_scan_params(
            load_orbax_params(path, load_ema=load_ema), cfg)
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        key = "state_dict_ema" if load_ema and "state_dict_ema" in ckpt else "state_dict"
        sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
        sd = {k: v.float().numpy() for k, v in sd.items()}
    else:
        dsd = load_safetensors_state_dict(path)
        sd = diffusers_to_torch_state_dict(dsd, depth=cfg.depth)
    return torch_to_flax_params(sd, cfg, null_embedding=null_embedding)


# --------------------------------------------------------------------------
# orbax: native sharded train-state checkpoints
# --------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    """Save {params, ema, opt_state, step} with orbax (sharding-aware)."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def repartition_scan_params(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """Re-split `blocks_scan_<g>` stacks to match cfg.block_groups().

    Scan-group boundaries are a COMPILE choice, not a weight property: a
    checkpoint trained without cache_span stores one stack per sr_ratio run,
    while a cache_span model needs extra splits at the span edges. Concat
    the saved stacks layer-wise, then re-split by the target grouping. A
    no-op when the layout already matches or the model is unrolled.
    """
    if cfg is None or not hasattr(cfg, "block_groups"):
        return params
    saved = sorted(
        (k for k in params if k.startswith("blocks_scan_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not saved:
        return params
    target = cfg.block_groups()
    if len(saved) == len(target):
        lead = jax.tree_util.tree_leaves(params[saved[0]])[0].shape[0]
        if all(
            jax.tree_util.tree_leaves(params[k])[0].shape[0] == cnt
            for k, (_, cnt) in zip(saved, target)
        ):
            return params
        del lead
    import jax.numpy as jnp

    full = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *(params[k] for k in saved)
    )
    depth = jax.tree_util.tree_leaves(full)[0].shape[0]
    want = sum(cnt for _, cnt in target)
    if depth != want:
        raise ValueError(
            f"checkpoint has {depth} stacked blocks but the model wants "
            f"{want} ({target})"
        )
    out = {k: v for k, v in params.items() if k not in saved}
    off = 0
    for g, (_, cnt) in enumerate(target):
        sl = slice(off, off + cnt)
        out[f"blocks_scan_{g}"] = jax.tree_util.tree_map(
            lambda x, sl=sl: x[sl], full
        )
        off += cnt
    return out


def _is_orbax_dir(path: str) -> bool:
    return (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or latest_checkpoint(path) is not None
        or latest_checkpoint(os.path.join(path, "checkpoints")) is not None
    )


def load_orbax_params(path: str, load_ema: bool = False) -> Dict[str, Any]:
    """Inference-side restore of a save_train_state checkpoint -> params.

    Accepts a step_N dir, a checkpoints/ dir of them, or a run workdir with
    a checkpoints/ subdir; returns ema_params if load_ema and present, else
    params. Uses a template-free PyTree restore (no optimizer state or model
    structure needed on the inference side).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
        for cand in (path, os.path.join(path, "checkpoints")):
            latest = latest_checkpoint(cand)
            if latest is not None:
                path = latest
                break
        else:
            raise FileNotFoundError(f"no orbax step_N checkpoint under {path}")
    restored = ocp.PyTreeCheckpointer().restore(path)
    key = "ema_params" if load_ema and "ema_params" in restored else "params"
    return restored[key]


def restore_train_state(ckpt_path: str, state):
    """Restore into an abstract/concrete TrainState template."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    restored = ckptr.restore(ckpt_path, template)
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params),
    )


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest step_N dir under ckpt_dir (resume support, train.py:469-479)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{max(steps)}")


# --------------------------------------------------------------------------
# Pretrained checkpoint resolution (reference: tools/download.py:16-47)
# --------------------------------------------------------------------------

PRETRAINED_MODELS = (
    "PixArt-Sigma-XL-2-256x256.pth",
    "PixArt-Sigma-XL-2-512-MS.pth",
    "PixArt-Sigma-XL-2-1024-MS.pth",
    "PixArt-Sigma-XL-2-2K-MS.pth",
)
_HF_REPO = "PixArt-alpha/PixArt-Sigma"


def find_model(model_name: str, cache_dir: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Resolve a released checkpoint name or local path to a state dict.

    Reference semantics (tools/download.py:22-29): known names are fetched
    from the PixArt-alpha/PixArt-Sigma HF repo (cached under
    $PIXART_PRETRAINED_DIR or output/pretrained_models/); anything else must
    be an existing local file.
    """
    if model_name in PRETRAINED_MODELS:
        cache_dir = cache_dir or os.environ.get(
            "PIXART_PRETRAINED_DIR", "output/pretrained_models"
        )
        local = os.path.join(cache_dir, model_name)
        if not os.path.isfile(local):
            try:
                from huggingface_hub import hf_hub_download
            except ImportError as e:
                raise FileNotFoundError(
                    f"{model_name} not cached at {local} and huggingface_hub "
                    "is unavailable; place the .pth there manually."
                ) from e
            os.makedirs(cache_dir, exist_ok=True)
            local = hf_hub_download(
                _HF_REPO, model_name, local_dir=cache_dir
            )
        return load_torch_state_dict(local)
    if not os.path.isfile(model_name):
        raise FileNotFoundError(f"Could not find PixArt checkpoint at {model_name}")
    return load_torch_state_dict(model_name)
