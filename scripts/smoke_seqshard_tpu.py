"""Real-chip smoke test: the Pallas one-pass kernel + its custom VJP must
execute INSIDE shard_map (round-4 VERDICT 1c).

All other seqshard evidence runs on the virtual CPU mesh, where the inner
impl is XLA — Mosaic-under-shard_map (VMEM limits, layouts) only bites on
hardware. This runs attention(impl='seqshard') on a 1-device mesh with
seq=1 on the real TPU: the shard_map machinery is fully engaged (manual
axes, per-shard lowering) and the inner auto_local dispatch picks the
Pallas one-pass kernel, forward and backward.

Usage: python scripts/smoke_seqshard_tpu.py
Prints one JSON line with max fwd/grad errors vs the XLA path.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixart_sigma_tpu.ops.attention import attention
from pixart_sigma_tpu.parallel.mesh import MeshConfig, build_mesh
from pixart_sigma_tpu.utils.compile_cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"need the real chip, got {dev}"
    mesh = build_mesh(MeshConfig(data=1, seq=1), devices=[dev])

    # production-like self-attention shapes (1024px: N=4096, Dh=72)
    B, N, H, Dh = 2, 4096, 16, 72
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, Dh), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, Dh), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, Dh), dtype=jnp.bfloat16)
    cot = jnp.asarray(rng.randn(B, N, H, Dh), dtype=jnp.bfloat16)

    def loss(impl):
        def f(q, k, v):
            out = attention(q, k, v, impl=impl)
            return (out.astype(jnp.float32) * cot.astype(jnp.float32)).sum()

        return f

    with jax.set_mesh(mesh):
        fwd = jax.jit(lambda q, k, v: attention(q, k, v, impl="seqshard"))
        out_seq = jax.device_get(fwd(q, k, v))
        g_seq = jax.device_get(
            jax.jit(jax.grad(loss("seqshard"), argnums=(0, 1, 2)))(q, k, v)
        )
    out_xla = jax.device_get(
        jax.jit(lambda q, k, v: attention(q, k, v, impl="xla"))(q, k, v)
    )
    g_xla = jax.device_get(
        jax.jit(jax.grad(loss("xla"), argnums=(0, 1, 2)))(q, k, v)
    )

    def relerr(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))

    fwd_err = relerr(out_seq, out_xla)
    grad_errs = [relerr(a, b) for a, b in zip(g_seq, g_xla)]
    ok = fwd_err < 2e-2 and max(grad_errs) < 5e-2  # bf16 tolerance
    print(json.dumps({
        "test": "seqshard_pallas_under_shard_map_tpu",
        "shape": [B, N, H, Dh],
        "fwd_rel_err": round(fwd_err, 5),
        "grad_rel_errs": [round(e, 5) for e in grad_errs],
        "ok": ok,
    }))
    assert ok


if __name__ == "__main__":
    main()
