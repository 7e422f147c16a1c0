"""Numerical-health tooling: the TPU-native DebugUnderflowOverflow.

Spec: /root/reference/diffusion/utils/misc.py:107-386 — a forward-hook
NaN/Inf tracer with per-module abs-min/max ring buffer. In JAX there are no
module hooks; the equivalents here are:

- `tree_health(tree)`: per-leaf finite-fraction / absmax / absmin report for
  params, grads, or activations — call it on demand from the trainer when a
  non-finite loss is seen (our watchdog trigger)
- `find_nonfinite(tree)`: names of offending leaves
- `trace_forward(model, variables, *args)`: the localize-in-ONE-run analogue
  of the reference's forward hooks — flax `capture_intermediates` records
  every submodule output, and `first_bad_module` walks them in PixArt
  forward order (embedders -> blocks by layer -> final layer) to name the
  first module whose OUTPUT overflowed, including the layer index inside an
  nn.scan group and the offending sub-module (attn/cross_attn/mlp)
- `jax.debug_nans` note: flip config.jax_debug_nans for hard tracing; that's
  the XLA-level analogue of raising inside the hook.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_name(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def tree_health(tree: Any) -> Dict[str, Tuple[float, float, float]]:
    """{leaf_name: (finite_fraction, abs_max, abs_min_nonzero)}."""
    out: Dict[str, Tuple[float, float, float]] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf, dtype=np.float32)
        finite = float(np.isfinite(arr).mean())
        absa = np.abs(arr)
        amax = float(absa.max(initial=0.0))
        nz = absa[absa > 0]
        amin = float(nz.min()) if nz.size else 0.0
        out[_leaf_name(path)] = (finite, amax, amin)
    return out


def find_nonfinite(tree: Any) -> List[str]:
    """Names of leaves containing NaN/Inf."""
    return [
        name for name, (finite, _, _) in tree_health(tree).items() if finite < 1.0
    ]


def format_health_report(tree: Any, top: int = 10) -> str:
    """Worst offenders by abs_max — the ring-buffer dump analogue."""
    health = tree_health(tree)
    rows = sorted(health.items(), key=lambda kv: -kv[1][1])[:top]
    lines = [f"{'leaf':60s} finite%   abs_max    abs_min"]
    for name, (finite, amax, amin) in rows:
        lines.append(f"{name[:60]:60s} {finite * 100:6.2f}  {amax:.3e}  {amin:.3e}")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# forward tracer: localize the first overflow in ONE run
# (reference DebugUnderflowOverflow, diffusion/utils/misc.py:107-386)
# ---------------------------------------------------------------------------

# PixArt forward execution order (models/pixart.py __call__); scan groups
# sort between y_embedder and final_layer by their group index.
_TOP_ORDER = [
    "x_embedder", "t_embedder", "csize_embedder", "ar_embedder",
    "t_block", "y_embedder", "<blocks>", "final_layer",
]
_BLOCK_SUB_ORDER = ["attn", "cross_attn", "mlp"]
# reference misc.py:365-367 uses the fp16 max as the overflow threshold
FP16_MAX = 65504.0


def trace_forward(model, variables, *args, **kwargs):
    """Run a forward pass capturing every submodule's output.

    Returns (output, intermediates). Pure function of its inputs — safe to
    call under jit, but typically used eagerly from the NaN watchdog.
    """
    out, st = model.apply(
        variables, *args,
        capture_intermediates=True, mutable=["intermediates"], **kwargs,
    )
    return out, st["intermediates"]


def _top_sort_key(name: str) -> Tuple[int, int]:
    m = re.match(r"blocks(?:_scan)?_(\d+)$", name)
    if m:
        return (_TOP_ORDER.index("<blocks>"), int(m.group(1)))
    if name in _TOP_ORDER:
        return (_TOP_ORDER.index(name), 0)
    return (len(_TOP_ORDER), 0)


def _sub_sort_key(path: Tuple[str, ...]) -> Tuple[Any, ...]:
    head = path[0] if path else ""
    try:
        i = _BLOCK_SUB_ORDER.index(head)
    except ValueError:
        i = len(_BLOCK_SUB_ORDER)
    return (i,) + path


def _leaf_stats(leaf, scan_layers: Optional[int]):
    """abs-max per scan layer ([L] when the leading axis is the scan axis,
    else a scalar over the whole array)."""
    arr = np.asarray(jax.device_get(leaf), dtype=np.float32)
    if scan_layers is not None and arr.ndim >= 1 and arr.shape[0] == scan_layers:
        flat = arr.reshape(arr.shape[0], -1)
        amax = np.abs(flat).max(axis=1)
        bad = ~np.isfinite(flat).all(axis=1)
        return amax, bad
    amax = float(np.abs(arr).max(initial=0.0))
    return np.asarray([amax]), np.asarray([not bool(np.isfinite(arr).all())])


def first_bad_module(
    intermediates: Dict[str, Any],
    scan_group_sizes: Optional[Dict[str, int]] = None,
    threshold: float = FP16_MAX,
) -> Optional[Dict[str, Any]]:
    """Name the first module (forward order) with a NaN/Inf or >threshold
    output. Returns {'module', 'layer', 'abs_max', 'nonfinite'} or None.

    `scan_group_sizes`: {top_level_name: n_layers} for nn.scan groups so the
    stacked leading axis is interpreted as the layer index (build it from
    PixArtConfig.block_groups()); unrolled modules need nothing.
    """
    scan_group_sizes = scan_group_sizes or {}
    for top in sorted(intermediates, key=_top_sort_key):
        sub = intermediates[top]
        n_layers = scan_group_sizes.get(top)
        # collect leaves with paths inside this top-level module
        found = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(sub):
            names = tuple(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            amax, bad = _leaf_stats(leaf, n_layers)
            over = bad | (amax > threshold)
            if over.any():
                layer = int(np.argmax(over)) if n_layers else None
                found.append((
                    layer if layer is not None else -1,
                    _sub_sort_key(names), names, amax, bad,
                ))
        if found:
            found.sort(key=lambda f: (f[0], f[1]))
            layer, _, names, amax, bad = found[0]
            i = int(np.argmax(bad | (amax > threshold)))
            sub_name = "/".join(n for n in names if n != "__call__")
            return {
                "module": top + (f"/{sub_name}" if sub_name else ""),
                "layer": layer if layer >= 0 else None,
                "abs_max": float(amax[i]),
                "nonfinite": bool(bad[i]),
            }
    return None


def format_overflow_report(bad: Optional[Dict[str, Any]]) -> str:
    if bad is None:
        return "forward trace: all module outputs finite and under fp16 max"
    where = bad["module"] + (
        f" [layer {bad['layer']}]" if bad["layer"] is not None else ""
    )
    kind = "non-finite" if bad["nonfinite"] else f"overflow (> {FP16_MAX:.0f})"
    return (
        f"first bad module output: {where} — {kind}, abs_max={bad['abs_max']:.3e}"
    )


def scan_group_sizes_from_config(cfg) -> Dict[str, int]:
    """{scan-group module name: n_layers} for first_bad_module."""
    if not getattr(cfg, "scan_blocks", False):
        return {}
    return {
        f"blocks_scan_{g}": count
        for g, (_, count) in enumerate(cfg.block_groups())
    }
