"""Numerical-health tooling: the TPU-native DebugUnderflowOverflow.

Spec: /root/reference/diffusion/utils/misc.py:107-386 — a forward-hook
NaN/Inf tracer with per-module abs-min/max ring buffer. In JAX there are no
module hooks; the equivalents here are:

- `tree_health(tree)`: per-leaf finite-fraction / absmax / absmin report for
  params, grads, or activations — call it on demand from the trainer when a
  non-finite loss is seen (our watchdog trigger)
- `find_nonfinite(tree)`: names of offending leaves
- `jax.debug_nans` note: flip config.jax_debug_nans for hard tracing; that's
  the XLA-level analogue of raising inside the hook.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

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
