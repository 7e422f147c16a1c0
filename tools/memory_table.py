#!/usr/bin/env python
"""Per-device training-state memory across mesh configurations.

Computes — analytically, from jax.eval_shape + the actual sharding rules in
parallel/mesh.py (no arrays materialised) — how many bytes of params,
optimizer state (CAME), and EMA land on ONE device of a (data, fsdp, tensor)
mesh for the production PixArt-Sigma-XL-2 model. This is the table in
docs/parallelism.md §"Per-device memory"; test_fsdp.py asserts the same
shrink on real (virtual-device) arrays.

Usage: python tools/memory_table.py [--image-size 1024] [--markdown]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--markdown", action="store_true")
    p.add_argument(
        "--meshes", default="8,1,1;4,2,1;2,4,1;1,8,1;2,2,2;1,4,2",
        help="semicolon list of data,fsdp,tensor triples (8 devices each "
             "unless they multiply to another count)",
    )
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pixart_sigma_tpu.models.pixart import PixArtConfig, PixArt
    from pixart_sigma_tpu.parallel.mesh import _path_names, _tp_axis
    from pixart_sigma_tpu.training.optim import build_optimizer

    cfg = PixArtConfig(
        input_size=args.image_size // 8,
        model_max_length=300,
        pe_interpolation=args.image_size / 512.0,
        dtype=jnp.bfloat16,
    )
    model = PixArt(cfg)
    B, L = 1, 300

    def init():
        return model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((B, cfg.input_size, cfg.input_size, 4), jnp.bfloat16),
            jnp.zeros((B,)),
            jnp.zeros((B, L, 4096), jnp.bfloat16),
            jnp.ones((B, L), jnp.int32),
        )["params"]

    params_shape = jax.eval_shape(init)
    tx = build_optimizer(name="came", learning_rate=1e-5, grad_clip_norm=0.01)
    opt_shape = jax.eval_shape(tx.init, params_shape)
    trees = {
        "params": params_shape,
        "opt(CAME)": opt_shape,
        "ema": params_shape,
    }

    def leaf_bytes(leaf) -> int:
        return int(np.prod(leaf.shape)) * leaf.dtype.itemsize if leaf.shape else leaf.dtype.itemsize

    def sharded_bytes(tree, fsdp_size, tp_size, min_size=2**16) -> int:
        """Mirror param_sharding()'s spec choice, but count bytes/device."""
        total = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            shape = list(leaf.shape)
            spec = [None] * len(shape)
            if tp_size > 1 and shape:
                axis = _tp_axis(_path_names(path), len(shape))
                if axis is not None and shape[axis] % tp_size == 0:
                    spec[axis] = tp_size
            if fsdp_size > 1 and shape and int(np.prod(shape)) >= min_size:
                order = sorted(range(len(shape)), key=lambda i: -shape[i])
                for ax in order:
                    if spec[ax] is None and shape[ax] % fsdp_size == 0:
                        spec[ax] = fsdp_size
                        break
            div = int(np.prod([s for s in spec if s]))
            total += leaf_bytes(leaf) // max(div, 1)
        return total

    meshes = [tuple(int(x) for x in m.split(",")) for m in args.meshes.split(";")]
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params_shape)
    )
    print(f"# PixArt-XL-2 {args.image_size}px — {n_params/1e6:.0f}M params, "
          f"CAME + EMA, fp32 state", file=sys.stderr)

    rows = []
    for d, f, t in meshes:
        per = {k: sharded_bytes(v, f, t) for k, v in trees.items()}
        total = sum(per.values())
        rows.append((d, f, t, per, total))

    repl_total = rows[0][4] if rows and rows[0][1] == 1 and rows[0][2] == 1 else None
    hdr = ("mesh (dxfxt)", "params", "opt(CAME)", "ema", "total/device", "vs replicated")
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(("{:>14}" + "{:>12}" * 5).format(*hdr))
    for d, f, t, per, total in rows:
        gib = lambda b: f"{b / 2**30:.2f} GiB"
        frac = f"{total / repl_total:.2f}x" if repl_total else "-"
        cells = (f"{d}x{f}x{t}", gib(per["params"]), gib(per["opt(CAME)"]),
                 gib(per["ema"]), gib(total), frac)
        if args.markdown:
            print("| " + " | ".join(cells) + " |")
        else:
            print(("{:>14}" + "{:>12}" * 5).format(*cells))


if __name__ == "__main__":
    main()
