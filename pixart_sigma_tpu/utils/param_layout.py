"""Convert DiT block params between per-layer and scan-stacked layouts.

scan layout: 'blocks_scan_<g>' scopes with leaves stacked on axis 0 over the
layers of group g (see PixArtConfig.block_groups). per-layer layout:
'blocks_<i>' scopes, one per layer — matches the reference .pth naming and is
what the checkpoint converters produce.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def stack_block_params(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """per-layer ('blocks_<i>') -> scan ('blocks_scan_<g>') layout."""
    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    layer = 0
    for g, (_sr, count) in enumerate(cfg.block_groups()):
        members = [params[f"blocks_{layer + j}"] for j in range(count)]
        out[f"blocks_scan_{g}"] = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *members
        )
        layer += count
    return out


def unstack_block_params(params: Dict[str, Any], cfg) -> Dict[str, Any]:
    """scan ('blocks_scan_<g>') -> per-layer ('blocks_<i>') layout."""
    out = {k: v for k, v in params.items() if not k.startswith("blocks_scan_")}
    layer = 0
    for g, (_sr, count) in enumerate(cfg.block_groups()):
        stacked = params[f"blocks_scan_{g}"]
        for j in range(count):
            out[f"blocks_{layer + j}"] = jax.tree_util.tree_map(
                lambda leaf, j=j: leaf[j], stacked
            )
        layer += count
    return out
