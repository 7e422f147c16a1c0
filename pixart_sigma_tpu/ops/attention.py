"""Attention dispatcher: XLA einsum path + (optional) Pallas flash kernel.

Replaces the reference's xformers.memory_efficient_attention calls
(PixArt_blocks.py:53,153). Layout is [B, N, H, Dh] (batch, tokens, heads,
head_dim) to match the xformers convention used by the reference.

Key design change vs the reference (SURVEY.md §7 "hard parts"): variable
caption lengths are handled with a padded [B, M] key mask folded into an
additive bias, instead of xformers' ragged BlockDiagonalMask packing. Padded
keys receive -inf logits, so the numerics are identical to packing while
keeping every shape static for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    fp32_softmax: bool,
) -> jnp.ndarray:
    """Reference-quality attention via einsum; XLA fuses this well on TPU.

    Inputs stay in their storage dtype (bf16) so the MXU runs at full bf16
    rate; `preferred_element_type=f32` gives f32 accumulation, and the
    softmax itself runs in f32 when fp32_softmax is set — same numerics as
    upcasting the operands, ~2x faster.
    """
    B, N, H, Dh = q.shape
    scale = Dh**-0.5
    dtype = q.dtype
    acc_t = jnp.float32 if fp32_softmax else dtype
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=acc_t
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(dtype), v, preferred_element_type=acc_t
    )
    return out.astype(dtype)


_NEG = -1e30  # finite -inf stand-in: exp(_NEG - x) underflows to 0 in f32

# seqshard replicates K/V per device; past this many bytes of replicated
# bf16 K+V, auto dispatch switches to the K/V-sharded ring impl (8K+ grids).
# Module-level so tests can lower it to exercise the ring path in-model.
RING_KV_BYTES = 1 << 30


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Online-softmax attention scanned over KEY chunks, in pure XLA ops.

    Flash-attention memory behavior (no [N, M] logits buffer — the live
    buffer is [B, H, N, chunk]) without a Pallas kernel, so GSPMD can
    partition it: with q sharded over tokens (sequence/context parallelism)
    the scan body's einsums split over the query dim and XLA inserts the
    K/V collectives. This is the sequence-parallel self-attention path for
    2K/4K grids (65k tokens), where any materialised logits tensor is
    impossible and opaque Pallas calls cannot be auto-partitioned.

    Numerics: f32 running max/denominator/accumulator — matches the
    fp32-softmax XLA path to f32 tolerance.
    """
    B, N, H, Dh = q.shape
    M = k.shape[1]
    scale = Dh**-0.5
    dtype = q.dtype
    chunk = min(chunk, M)
    pad = (-M) % chunk
    if key_mask is None:
        key_mask = jnp.ones((B, M), dtype=bool)
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_mask = jnp.pad(key_mask.astype(bool), ((0, 0), (0, pad)))
    n_chunks = (M + pad) // chunk
    # [C, B, chunk, H, Dh] so lax.scan slices a chunk per step
    ks = jnp.moveaxis(k.reshape(B, n_chunks, chunk, H, Dh), 1, 0)
    vs = jnp.moveaxis(v.reshape(B, n_chunks, chunk, H, Dh), 1, 0)
    ms = jnp.moveaxis(key_mask.reshape(B, n_chunks, chunk), 1, 0)

    m0 = jnp.full((B, H, N), _NEG, dtype=jnp.float32)
    l0 = jnp.zeros((B, H, N), dtype=jnp.float32)
    a0 = jnp.zeros((B, H, N, Dh), dtype=jnp.float32)

    def body(carry, inputs):
        m, l, acc = carry
        kc, vc, mc = inputs
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, kc, preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mc[:, None, None, :], logits, _NEG)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * corr + p.sum(axis=-1)
        pv = jnp.einsum(
            "bhnm,bmhd->bhnd", p.astype(dtype), vc,
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr[..., None] + pv
        return (m_new, l_new, acc_new), None

    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), (ks, vs, ms))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.einsum("bhnd->bnhd", out).astype(dtype)


def seq_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    fp32_softmax: bool = False,
    axis: str = "seq",
    inner_impl: str = "auto_local",
) -> jnp.ndarray:
    """Context-parallel attention: shard_map over the ambient mesh's seq
    axis. Queries stay token-sharded; K/V are replicated across the seq
    axis only (one gather, O(M*C) comm vs O(N*M*C/seq) compute); each
    device then runs the best SINGLE-CHIP impl — the Pallas one-pass/flash
    kernel on TPU — on its query shard. This keeps the kernel's measured
    4.5x advantage over the GSPMD-partitionable chunked-XLA path (81 vs
    18 ms at N=M=4096, v5e) while still splitting the work across the
    axis; chunked remains the fallback when shapes don't divide.

    The batch dim stays sharded over the mesh's data/fsdp axes (declared in
    the specs — otherwise GSPMD would all-gather the batch and every data
    group would redundantly compute full-batch attention for its token
    shard). Callers must ensure B divides the data axes (_dispatch checks).

    inner_impl: impl forced on each shard ('auto_local' = per-shard auto).
    """
    from jax.sharding import PartitionSpec as P

    from pixart_sigma_tpu.parallel.mesh import batch_shard_axes

    am = jax.sharding.get_abstract_mesh()
    batch = batch_shard_axes(axis) or None
    q_spec = P(batch, axis, None, None)
    kv_spec = P(batch, None, None, None)
    if key_mask is None:
        f = jax.shard_map(
            lambda q, k, v: attention(
                q, k, v, fp32_softmax=fp32_softmax, impl=inner_impl
            ),
            mesh=am, in_specs=(q_spec, kv_spec, kv_spec), out_specs=q_spec,
            check_vma=False,  # pallas_call out_shapes carry no vma info
        )
        return f(q, k, v)
    f = jax.shard_map(
        lambda q, k, v, m: attention(
            q, k, v, key_mask=m, fp32_softmax=fp32_softmax, impl=inner_impl
        ),
        mesh=am,
        in_specs=(q_spec, kv_spec, kv_spec, P(batch, None)),
        out_specs=q_spec,
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    return f(q, k, v, key_mask)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    axis: str = "seq",
) -> jnp.ndarray:
    """Ring attention: context parallelism with K/V SHARDED over the seq
    axis (cf. Ring Attention / llama-3-style context parallelism; PAPERS.md).

    seq_sharded_attention replicates K/V per device — one gather, fine to
    ~65k tokens where K/V is ~300 MB transient. Past that (8K+ grids, video)
    the replicated K/V becomes the memory term. Here every operand stays
    token-sharded: each device holds q/k/v shards of N/s tokens, runs
    online-softmax accumulation against the K/V shard it currently holds,
    and `ppermute`s the K/V block around the ring s-1 times — peak per-device
    attention memory O(N/s * d + (N/s)^2) with O(N*C) total comm riding ICI
    neighbor links, and compute/comm overlap is XLA's to schedule.

    Numerics match chunked_attention (f32 running max/denominator/acc).
    Differentiable by construction (scan + ppermute autodiff; the backward
    re-permutes the same ring). Requires N % s == 0 and B divisible by the
    data axes. Opt-in via impl='ring' — at <=65k tokens seqshard's per-shard
    Pallas kernel is faster (MXU-bound vs this XLA path), so ring is the
    capacity lever, not the speed lever.
    """
    from jax.sharding import PartitionSpec as P

    from pixart_sigma_tpu.parallel.mesh import batch_shard_axes

    am = jax.sharding.get_abstract_mesh()
    assert axis in am.axis_names, (axis, am)
    s = int(am.shape[axis])
    B, N, H, Dh = q.shape
    M = k.shape[1]
    assert N % s == 0 and M % s == 0, (N, M, s)
    scale = Dh**-0.5
    dtype = q.dtype
    masked = key_mask is not None
    batch = batch_shard_axes(axis) or None
    tok_spec = P(batch, axis, None, None)
    mask_spec = P(batch, axis)

    def body(q, k, v, km=None):
        # operands are the per-device shards: q [b, n, H, Dh], k/v [b, m, ...]
        n = q.shape[1]
        m0 = jnp.full((q.shape[0], H, n), _NEG, dtype=jnp.float32)
        l0 = jnp.zeros((q.shape[0], H, n), dtype=jnp.float32)
        a0 = jnp.zeros((q.shape[0], H, n, Dh), dtype=jnp.float32)
        perm = [(i, (i + 1) % s) for i in range(s)]  # pass K/V to the right

        def step(carry, _):
            # unmasked fast path (the auto-dispatched huge-grid case):
            # no logits select and one fewer ppermute per ring step
            if masked:
                m, l, acc, kc, vc, mc = carry
            else:
                m, l, acc, kc, vc = carry
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q, kc, preferred_element_type=jnp.float32
            ) * scale
            if masked:
                logits = jnp.where(mc[:, None, None, :], logits, _NEG)
            m_new = jnp.maximum(m, logits.max(axis=-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_new = l * corr + p.sum(axis=-1)
            pv = jnp.einsum(
                "bhnm,bmhd->bhnd", p.astype(dtype), vc,
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * corr[..., None] + pv
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            if masked:
                mc = jax.lax.ppermute(mc, axis, perm)
                return (m_new, l_new, acc_new, kc, vc, mc), None
            return (m_new, l_new, acc_new, kc, vc), None

        init = (m0, l0, a0, k, v) + ((km,) if masked else ())
        carry, _ = jax.lax.scan(step, init, None, length=s)
        m, l, acc = carry[0], carry[1], carry[2]
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return jnp.einsum("bhnd->bnhd", out).astype(dtype)

    if masked:
        f = jax.shard_map(
            body, mesh=am,
            in_specs=(tok_spec, tok_spec, tok_spec, mask_spec),
            out_specs=tok_spec, check_vma=False,
        )
        return f(q, k, v, key_mask)
    f = jax.shard_map(
        body, mesh=am,
        in_specs=(tok_spec, tok_spec, tok_spec),
        out_specs=tok_spec, check_vma=False,
    )
    return f(q, k, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    fp32_softmax: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, N, H, Dh]; k, v: [B, M, H, Dh]
    key_mask: [B, M] bool — True for valid keys (padded keys masked out)
    bias: [B, H, N, M] or broadcastable additive bias
    impl: 'auto' | 'xla' | 'flash' | 'chunked' | ... ('auto_local' = auto
    without the sequence-parallel redirect; used inside shard_map)
    """
    choice = impl
    if impl in ("auto", "auto_local"):
        choice = (
            _dispatch(q, k, key_mask, local=impl == "auto_local")
            if bias is None else "xla"
        )
    elif impl in ("onepass", "flash", "allheads", "headsmajor"):
        # An explicitly forced Pallas impl under an active seq mesh: the
        # opaque pallas_call cannot be auto-partitioned, so GSPMD would
        # replicate the sharded operands (silently losing the parallelism)
        # or fail at compile. Route it through the shard_map wrapper with
        # the requested impl forced per shard. seq_axis_size() is 1 inside
        # the shard_map body (Manual axis), so this cannot recurse. When
        # the tokens/batch don't divide the mesh axes (shard_map would
        # reject them) fall back to the GSPMD-partitionable chunked path,
        # mirroring auto dispatch.
        from pixart_sigma_tpu.parallel.mesh import (
            batch_shard_axes,
            seq_axis_size,
        )

        seq = seq_axis_size()
        if seq > 1:
            assert bias is None, "seq-sharded attention: dense bias unsupported"
            am = jax.sharding.get_abstract_mesh()
            batch_div = 1
            for a in batch_shard_axes():
                batch_div *= int(am.shape[a])
            if q.shape[1] % seq == 0 and q.shape[0] % batch_div == 0:
                return seq_sharded_attention(
                    q, k, v, key_mask=key_mask, fp32_softmax=fp32_softmax,
                    inner_impl=impl,
                )
            return chunked_attention(q, k, v, key_mask=key_mask)

    if choice == "seqshard":
        assert bias is None, "seq-sharded attention: dense bias unsupported"
        return seq_sharded_attention(
            q, k, v, key_mask=key_mask, fp32_softmax=fp32_softmax
        )
    if choice == "ring":
        assert bias is None, "ring attention: dense bias unsupported"
        return ring_attention(q, k, v, key_mask=key_mask)

    if choice == "allheads":
        from pixart_sigma_tpu.ops.flash_attention import crossattn_allheads

        assert bias is None, "allheads kernel: dense bias unsupported; impl='xla'"
        return crossattn_allheads(q, k, v, key_mask=key_mask)
    if choice == "onepass":
        from pixart_sigma_tpu.ops.flash_attention import onepass_attention

        assert bias is None, "onepass kernel: dense bias unsupported; impl='xla'"
        return onepass_attention(q, k, v, key_mask=key_mask)
    if choice == "headsmajor":
        from pixart_sigma_tpu.ops.flash_attention import crossattn_headsmajor

        assert bias is None, "headsmajor kernel: dense bias unsupported; impl='xla'"
        assert key_mask is not None, "headsmajor kernel needs a key_mask"
        return crossattn_headsmajor(q, k, v, key_mask=key_mask)
    if choice == "flash":
        from pixart_sigma_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, key_mask=key_mask)
    if choice == "chunked":
        assert bias is None, "chunked impl: dense bias unsupported; impl='xla'"
        return chunked_attention(q, k, v, key_mask=key_mask)
    if choice != "xla":
        raise ValueError(
            f"unknown attention impl {choice!r}; expected one of "
            "'auto', 'xla', 'flash', 'chunked', 'onepass', 'allheads', "
            "'headsmajor', 'seqshard', 'ring'"
        )

    if key_mask is not None:
        key_bias = jnp.where(key_mask[:, None, None, :], 0.0, -jnp.inf).astype(
            jnp.float32
        )
        bias = key_bias if bias is None else bias + key_bias
    return _xla_attention(q, k, v, bias, fp32_softmax)


def _dispatch(q: jnp.ndarray, k: jnp.ndarray, key_mask, local: bool = False) -> str:
    """Pick the fastest path on TPU (gates tuned from v5e measurements).

    `local`: we are already inside the seq-parallel shard_map — dispatch
    for this device's query shard only (no further seq redirect)."""
    from pixart_sigma_tpu.parallel.mesh import batch_shard_axes, seq_axis_size

    if not local:
        seq = seq_axis_size()
        if seq > 1:
            # sequence-parallel context. Long K/V (self-attention): shard_map
            # the token-sharded queries and run the Pallas kernel per shard
            # (measured 4.5x faster than the GSPMD-partitionable chunked
            # path single-chip); chunked is the fallback when the token
            # count doesn't divide the axis — or when the batch doesn't
            # divide the data axes (shard_map also shards the batch dim so
            # data groups don't redundantly recompute it). Short caption
            # K/V: the plain einsum partitions fine under GSPMD.
            if k.shape[1] <= 512:
                return "xla"
            try:
                am = jax.sharding.get_abstract_mesh()
                batch_div = 1
                for a in batch_shard_axes():
                    batch_div *= int(am.shape[a])
            except Exception:
                batch_div = 1
            if q.shape[1] % seq == 0 and q.shape[0] % batch_div == 0:
                # seqshard replicates K/V per device; past ~1 GiB of
                # replicated K/V (8K+ grids / video contexts) switch to the
                # ring impl, which keeps K/V token-sharded (capacity over
                # the per-shard Pallas kernel's speed). bf16 K+V bytes:
                kv_bytes = 2 * 2 * (
                    (q.shape[0] // batch_div) * k.shape[1]
                    * k.shape[2] * k.shape[3]
                )
                if kv_bytes > RING_KV_BYTES and k.shape[1] % seq == 0:
                    return "ring"
                return "seqshard"
            return "chunked"
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return "xla"
    if platform != "tpu":
        return "xla"
    from pixart_sigma_tpu.ops import flash_attention as fa

    B, N, M, Dh = q.shape[0], q.shape[1], k.shape[1], q.shape[-1]
    if Dh < 128 and fa.onepass_supported(N, M, Dh):
        # one-pass kernel: whole K/V resident in VMEM, exact row max, no HBM
        # logits. v5e measurements (B=16, H=16, Dh=72): self-attn N=M=4096
        # 24.2 -> 17.5 ms, kv-compressed M=1024 14.1 -> 7.6 ms. For masked
        # cross-attn (M=300 captions) the fused XLA softmax stays ahead
        # end-to-end (bench 0.421 vs 0.407 img/s) until N is huge and the
        # XLA path's [N, M] f32 logits HBM roundtrip dominates.
        if key_mask is not None:
            # short-key caption cross-attention: the all-heads kernel reads
            # q / writes out in the flat [B, N, C] layout (no head transpose
            # materialisation) — 4.7 vs 5.5 ms at B=16/N=4096/M=300 on v5e.
            # Standalone at B=24 the kernel measures slower (6.5 vs 5.8 ms)
            # but END-TO-END it still wins (bench 0.434 vs 0.430 img/s): the
            # XLA path pays extra head-split transposes that fuse away in
            # isolation but not inside the full block. Trust the e2e number.
            import os

            forced = os.environ.get("PIXART_CROSSATTN_IMPL")
            if forced:
                return forced
            if fa.allheads_supported(N, M, key_mask):
                return "allheads"
            return "onepass" if N >= 8192 else "xla"
        return "onepass" if N >= 2048 else "xla"
    if key_mask is not None:
        # masked attention with K/V too large for the one-pass kernel
        return "flash" if (N >= 8192 and M >= 2048 and Dh % 128 != 0) else "xla"
    # huge self-attention (2K/4K grids): XLA OOMs materialising the logits —
    # the online-softmax flash kernel is mandatory
    return "flash" if N >= 8192 else "xla"
