"""Pallas TPU flash attention (forward + backward) for the DiT hot path.

Replaces xformers.memory_efficient_attention (reference
PixArt_blocks.py:53,153). Online-softmax tiling: the [N, M] logit matrix is
never materialised in HBM — at 4K resolution (16k latent tokens) that is the
difference between ~34 GB of logits and a few MB of VMEM tiles.

Design (see /opt/skills/guides/pallas_guide.md):
- layout [B*H, N, D]; head_dim (72 for PixArt-XL) zero-padded to the 128-lane
  width — zero K/Q lanes don't change logits, zero V lanes are sliced off
- 3D grid (batch*heads, q-blocks, kv-blocks): the kv dimension is innermost
  and iterated sequentially, carrying (m, l, acc) state in VMEM scratch with
  @pl.when init/flush at the first/last kv step; Pallas double-buffers the
  K/V block DMAs. VMEM use is bounded by the block sizes, independent of
  sequence length (16k+ tokens supported)
- fp32 softmax always (the kernel subsumes the reference's fp32_attention
  NaN-avoidance flag)
- backward = standard two-kernel flash bwd (dkv sweeping q-blocks, dq
  sweeping kv-blocks) using the saved logsumexp; recomputes P
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30
_LANES = 8  # minor-dim width for lse/delta (block last-dim == array last-dim)

# All kernels work in the log2 domain: the wrappers fold log2(e) into the
# softmax scale on q, and the kernels use exp2 instead of exp (the VPU's exp
# IS exp2(x*log2e), so this removes one multiply pass per logit). lse is
# stored in log2 units; backward rescales ds by ln(2) for the chain rule.
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _pad_heads(x: jnp.ndarray, d_pad: int) -> jnp.ndarray:
    if x.shape[-1] == d_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, d_pad - x.shape[-1])]
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _kv_tail_mask(s, j, block_k, kv_len):
    """-inf on key columns past the true kv length (padded tail)."""
    if kv_len % block_k == 0:
        return s
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < kv_len, s, _NEG_INF)


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale,
    kv_len, block_k,
):
    """Grid (BH, nq, nk); kv innermost. lse_ref None => inference variant."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [BQ, D] storage dtype (bf16): full-rate MXU, f32 accum
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK] f32
    s = _kv_tail_mask(s, j, block_k, kv_len)
    m_prev = m_scr[:, 0:1]  # [BQ, 1]
    l_prev = l_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _flush():
        l = l_scr[:, 0:1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:  # log2 units, matching the exp2 backward
            lse_ref[0] = jnp.broadcast_to(
                m_scr[:, 0:1] + jnp.log2(l), lse_ref.shape[1:]
            )


def _flash_fwd(q, k, v, scale, block_q, block_k, kv_len=None, with_lse=True):
    """q [BH, N, D], k/v [BH, M, D] -> (out, lse [BH, N, _LANES] or None)."""
    BH, N, D = q.shape
    M = k.shape[1]
    kv_len = M if kv_len is None else kv_len
    grid = (BH, N // block_q, M // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
        pltpu.VMEM((block_q, _LANES), jnp.float32),  # running denom
        pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
    ]
    # bh / q-block dims are parallel; the kv sweep is the sequential reduction
    comp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")
    )
    if not with_lse:
        kernel = lambda q_ref, k_ref, v_ref, o_ref, m_s, l_s, a_s: _fwd_kernel(
            q_ref, k_ref, v_ref, o_ref, None, m_s, l_s, a_s, scale=scale,
            kv_len=kv_len, block_k=block_k,
        )
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            scratch_shapes=scratch, compiler_params=comp,
        )(q, k, v)
        return out, None
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            jax.ShapeDtypeStruct((BH, N, _LANES), jnp.float32),
        ],
        scratch_shapes=scratch, compiler_params=comp,
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# one-pass forward (whole K/V resident in VMEM; no online-softmax rescaling)
# ---------------------------------------------------------------------------
#
# For the production token counts (<= 4k keys: 1024px self-attention, every
# kv-compressed layer, and 300-token caption cross-attention) the whole K/V
# fits VMEM, so online softmax is pure overhead: the one-pass kernel computes
# the EXACT row max and does a single exp sweep per logit. The softmax
# denominator costs nothing — V's spare padded lane is set to 1.0, so the PV
# matmul emits sum(p) in that lane for free (same trick as the key mask on
# K's spare lane). VPU work per logit drops from ~8 ops (online rescaling) to
# ~3, and logits never touch HBM (the XLA path streams [N, M] f32 logits
# through HBM, which is its bottleneck — CLAUDE.md measurements).


def _onepass_kernel(q_ref, k_ref, v_ref, madd_ref, o_ref, lse_ref, s_scr, *,
                    kv_len):
    """Grid (BH, nq); the full [M, D] K/V block is revisited across q-blocks.

    q_ref [1, BQ, D] (pre-scaled by Dh^-0.5 * log2e), k_ref/v_ref
    [1, M_pad, D], madd_ref [1, M_pad] f32 additive key mask or None,
    o_ref [1, BQ, D], s_scr [BQ, M_pad] f32. lse_ref None => inference.
    V's lane (d_pad-1) carries 1.0, so acc[:, -1] is the softmax denominator.
    """
    q = q_ref[0]
    k = k_ref[0]
    m_pad = k.shape[0]
    s_scr[:] = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if madd_ref is not None:  # padded caption mask (tail included)
        s_scr[:] = s_scr[:] + madd_ref[0, 0:1, :]  # [1, M] broadcast
    elif kv_len != m_pad:  # zero-padded K tail would get logit 0, exp -> 1
        col = jax.lax.broadcasted_iota(jnp.int32, s_scr.shape, 1)
        s_scr[:] = jnp.where(col < kv_len, s_scr[:], _NEG_INF)
    m = jnp.max(s_scr[:], axis=-1, keepdims=True)  # exact row max
    p = jnp.exp2(s_scr[:] - m).astype(v_ref.dtype)
    acc = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, D]; acc[:, -1] == sum(p) via V's ones lane
    l = jnp.maximum(acc[:, -1:], 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:  # log2 units, matching the exp2 backward
        lse_ref[0] = jnp.broadcast_to(m + jnp.log2(l), lse_ref.shape[1:])


def _onepass_fwd(q, k, v, madd, block_q, kv_len, n_heads, with_lse):
    """q [BH, N, D], k/v [BH, M_pad, D] (V ones-lane), madd [B, M_pad]|None."""
    BH, N, D = q.shape
    M = k.shape[1]
    grid = (BH, N // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if madd is not None:
        # [B, 8, M]: sublane dim 8 satisfies the TPU block tiling rule
        in_specs.append(
            pl.BlockSpec((1, 8, M), lambda b, i: (b // n_heads, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(madd)
    o_spec = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((block_q, M), jnp.float32)]
    comp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary")
    )
    has_madd = madd is not None

    def kernel(*refs):
        if has_madd:
            qr, kr, vr, mr = refs[:4]
            rest = refs[4:]
        else:
            qr, kr, vr = refs[:3]
            mr, rest = None, refs[3:]
        if with_lse:
            orf, lser, s = rest
        else:
            (orf, s), lser = rest, None
        _onepass_kernel(qr, kr, vr, mr, orf, lser, s, kv_len=kv_len)

    if not with_lse:
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            scratch_shapes=scratch, compiler_params=comp,
        )(*args)
        return out, None
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, N, D), q.dtype),
            jax.ShapeDtypeStruct((BH, N, _LANES), jnp.float32),
        ],
        scratch_shapes=scratch, compiler_params=comp,
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale, kv_len, block_k,
):
    """Grid (BH, nkv, nq); one kv-block per (b, j), sweep q innermost."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k = k_ref[0]  # [BK, D]
    v = v_ref[0]
    q = q_ref[0]  # [BQ, D]
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]  # [BQ, 1]
    delta = delta_ref[0][:, 0:1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, BK]
    s = _kv_tail_mask(s, j, block_k, kv_len)
    p = jnp.exp2(s - lse)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * (scale * _LN2)  # d(exp2)/dx = exp2(x) * ln2
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _flush():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale,
    kv_len, block_k,
):
    """Grid (BH, nq, nkv); one q-block per (b, i), sweep kv innermost."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = _kv_tail_mask(s, j, block_k, kv_len)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * (scale * _LN2)  # d(exp2)/dx = exp2(x) * ln2
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _flush():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd(res, g, scale, block_q, block_k, kv_len):
    q, k, v, out, lse = res
    BH, N, D = q.shape
    M = k.shape[1]
    do = g
    delta2d = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta2d[..., None], (BH, N, _LANES))

    # dkv: grid (BH, nkv, nq) — q/do/lse blocks stream along the inner dim
    qd_spec = pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, j, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=(BH, M // block_k, N // block_q),
        in_specs=[qd_spec, kv_spec, kv_spec, qd_spec, lse_spec, lse_spec],
        out_specs=[kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BH, M, D), q.dtype),
            jax.ShapeDtypeStruct((BH, M, D), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(q, k, v, do, lse, delta)

    # dq: grid (BH, nq, nkv) — k/v blocks stream along the inner dim
    qd_spec2 = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    lse_spec2 = pl.BlockSpec((1, block_q, _LANES), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=(BH, N // block_q, M // block_k),
        in_specs=[qd_spec2, kv_spec2, kv_spec2, qd_spec2, lse_spec2, lse_spec2],
        out_specs=qd_spec2,
        out_shape=jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale, block_q, block_k, kv_len):
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k, kv_len, with_lse=False)
    return out


def _flash_core_fwd(q, k, v, scale, block_q, block_k, kv_len):
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k, kv_len, with_lse=True)
    return out, (q, k, v, out, lse)


def _bwd_block(dim: int, cap: int = 512) -> int:
    """Largest tile <= cap that DIVIDES dim (dims are 128-multiples, so 128
    always divides); a non-dividing clamp would silently drop the tail block
    from the pallas grid and leave those gradient rows uninitialised."""
    return next(b for b in (cap, 384, 256, 128) if dim % b == 0)


def _flash_core_bwd(scale, block_q, block_k, kv_len, res, g):
    # the backward kernels keep [BQ, BK] f32 s/p/ds tiles plus dk/dv
    # accumulators live at once — cap at 512 tiles regardless of the
    # (possibly larger) forward tiles to stay inside VMEM
    N, M = res[0].shape[1], res[1].shape[1]
    return _flash_bwd(res, g, scale, min(_bwd_block(N), block_q),
                      min(_bwd_block(M), block_k), kv_len)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _onepass_core(q, k, v, madd, block_q, kv_len, n_heads):
    out, _ = _onepass_fwd(q, k, v, madd, block_q, kv_len, n_heads,
                          with_lse=False)
    return out


def _onepass_core_fwd(q, k, v, madd, block_q, kv_len, n_heads):
    out, lse = _onepass_fwd(q, k, v, madd, block_q, kv_len, n_heads,
                            with_lse=True)
    return out, (q, k, v, madd, out, lse)


def _onepass_core_bwd(block_q, kv_len, n_heads, res, g):
    # reuse the two-kernel flash backward (tiled; recomputes P from lse).
    # The additive mask is re-injected via the spare-lane trick (k lane D-1
    # carries madd, q lane D-1 carries 1.0) so the recomputed P matches the
    # forward. Spurious lane gradients vanish (p == 0 exactly on masked
    # columns) or are sliced off by the caller's un-pad. V's ones lane is
    # harmless: g is zero on spare lanes, and dv's spare lanes are discarded.
    q, k, v, madd, out, lse = res
    if madd is not None:
        D = q.shape[-1]
        k = k.at[:, :, D - 1].set(
            jnp.repeat(madd[:, 0, :].astype(k.dtype), n_heads, axis=0)
        )
        q = q.at[:, :, D - 1].set(jnp.asarray(1.0, q.dtype))
    M = k.shape[1]
    bk = _bwd_block(M)
    bq = _bwd_block(q.shape[1])
    dq, dk, dv = _flash_bwd((q, k, v, out, lse), g, 1.0, bq, bk, kv_len)
    return dq, dk, dv, None


_onepass_core.defvjp(_onepass_core_fwd, _onepass_core_bwd)

# VMEM budget for the one-pass kernel: s [BQ, M] f32 + double-buffered K/V
# bf16 + q/o blocks must stay well under ~16MB (CLAUDE.md hardware note).
ONEPASS_MAX_KV = 4096


def onepass_supported(n: int, m: int, dh: int) -> bool:
    m_pad = max(128, ((m + 127) // 128) * 128)
    # dh must be strictly below the padded lane width: the kernel needs a
    # spare lane in V for the denominator (and in K for the mask)
    d_pad = max(128, ((dh + 127) // 128) * 128)
    return m_pad <= ONEPASS_MAX_KV and dh < d_pad


def _onepass_block_q(m_pad: int, n_pad: int) -> int:
    # budget ~8MB for the [BQ, M] f32 logits scratch; smaller M -> bigger
    # q-blocks so per-grid-step overheads amortise (measured on v5e:
    # M=4096 best at BQ=512, M=1024 at BQ=2048, M=384 at BQ=4096 — all
    # empirically VMEM-safe). Power-of-two BQ so it divides token counts.
    budget = 8 * 1024 * 1024 // (4 * m_pad)
    bq = 128
    while bq * 2 <= min(budget, 4096):
        bq *= 2
    return min(bq, n_pad)


def onepass_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
) -> jnp.ndarray:
    """One-pass (full-row softmax) attention over [B, N, H, Dh].

    For key counts whose K/V fit VMEM (<= ONEPASS_MAX_KV after padding):
    exact row max, a single exp sweep, denominator free via V's spare padded
    lane, and logits never written to HBM. key_mask [B, M] rides K's spare
    lane exactly like `flash_attention`. fp32 softmax always.
    """
    B, N, H, Dh = q.shape
    M = k.shape[1]
    d_pad = max(128, ((Dh + 127) // 128) * 128)
    assert Dh < d_pad, "onepass kernel needs a spare padded lane (Dh < 128k)"
    m_pad = max(128, ((M + 127) // 128) * 128)
    n128 = max(128, ((N + 127) // 128) * 128)
    bq = block_q or _onepass_block_q(m_pad, n128)
    bq = min(bq, n128)
    n_pad = ((N + bq - 1) // bq) * bq

    # scale + log2e folded into q; all layout ops below are elementwise/pad/
    # transpose chains that XLA fuses into single passes (no .at[].set
    # rewrites — the key mask travels as a tiny separate [B, M_pad] input)
    q = q * jnp.asarray(Dh**-0.5 * _LOG2E, q.dtype)

    def to_bh(x, seq_pad, d_target):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], Dh)
        if seq_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, seq_pad - x.shape[1]), (0, 0)))
        return _pad_heads(x, d_target)

    q_bh = to_bh(q, n_pad, d_pad)
    k_bh = to_bh(k, m_pad, d_pad)
    # denominator rides V's spare lane through the PV matmul: pad to
    # d_pad - 1 with zeros, then concat a ones lane (fuses with the pad)
    v_bh = to_bh(v, m_pad, d_pad - 1)
    v_bh = jnp.concatenate(
        [v_bh, jnp.ones((*v_bh.shape[:2], 1), v_bh.dtype)], axis=-1
    )
    kv_len = M
    madd = None
    if key_mask is not None:
        madd = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(
            jnp.float32
        )
        madd = jnp.pad(madd, ((0, 0), (0, m_pad - M)), constant_values=_NEG_INF)
        madd = jnp.broadcast_to(madd[:, None, :], (B, 8, m_pad))
        kv_len = m_pad  # padded tail already masked via madd

    out = _onepass_core(q_bh, k_bh, v_bh, madd, bq, kv_len, H)
    out = out[:, :N, :Dh].reshape(B, H, N, Dh).transpose(0, 2, 1, 3)
    return out


# ---------------------------------------------------------------------------
# all-heads cross-attention kernel (flat [B, N, C] layout, no head transpose)
# ---------------------------------------------------------------------------
#
# For caption cross-attention (short keys, the head dim packed inside C) the
# dominant costs of the head-major kernels are the wrapper's q/out
# [B,N,H,Dh] -> [B*H,N,128] transpose+pad materialisations. This kernel
# reads Q and writes OUT directly in the [B, N, C] layout the qkv/proj
# Denses use (free bitcast-reshape from the model's 4D view) and loops over
# heads in-kernel with static C-slices. Whole K/V resident per program.
# Measured (B=16, H=16, N=4096, M=300): 4.7 ms vs 5.5 ms fused-XLA.


def _allheads_kernel(q_ref, k_ref, v_ref, madd_ref, o_ref, *, n_heads, d_head,
                     scale):
    q = q_ref[0]  # [BQ, C]
    k = k_ref[0]  # [M_pad, C]
    v = v_ref[0]
    madd = madd_ref[0, 0:1, :]  # [1, M_pad]
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + madd
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def allheads_supported(n: int, m: int, key_mask) -> bool:
    m_pad = max(128, ((m + 127) // 128) * 128)
    return key_mask is not None and n >= 1024 and m_pad <= 512


def crossattn_allheads(
    q: jnp.ndarray,  # [B, N, H, Dh]
    k: jnp.ndarray,  # [B, M, H, Dh]
    v: jnp.ndarray,
    key_mask: jnp.ndarray,  # [B, M] bool
    block_q: int = 512,
) -> jnp.ndarray:
    B, N, H, Dh = q.shape
    M = k.shape[1]
    C = H * Dh
    m_pad = max(128, ((M + 127) // 128) * 128)
    bq = min(block_q, max(128, ((N + 127) // 128) * 128))
    n_pad = ((N + bq - 1) // bq) * bq
    # free reshapes (adjacent contiguous dims)
    qf = q.reshape(B, N, C)
    kf = k.reshape(B, M, C)
    vf = v.reshape(B, M, C)
    if n_pad != N:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - N), (0, 0)))
    kf = jnp.pad(kf, ((0, 0), (0, m_pad - M), (0, 0)))
    vf = jnp.pad(vf, ((0, 0), (0, m_pad - M), (0, 0)))
    madd = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
    madd = jnp.pad(madd, ((0, 0), (0, m_pad - M)), constant_values=_NEG_INF)
    madd = jnp.broadcast_to(madd[:, None, :], (B, 8, m_pad))
    out = _allheads_core(qf, kf, vf, madd, key_mask, H, Dh, bq)
    return out[:, :N].reshape(B, N, H, Dh)


# ---------------------------------------------------------------------------
# heads-major cross-attention (inference fast path)
# ---------------------------------------------------------------------------

def _headsmajor_kernel(q_ref, k_ref, v_ref, madd_ref, o_ref, *, scale):
    """Per program: one batch elem, one q block, ALL heads — heads-major
    padded layout, so every per-head access is a clean [*, 128]-aligned
    block index. The allheads (flat-layout) kernel instead slices q/out at
    72-lane offsets, and those cross-lane relayouts dominate its runtime at
    production batch (measured v5e, B=24: allheads 6.5 ms vs XLA 5.8 —
    this kernel 2.7 ms)."""
    H = q_ref.shape[1]
    madd = madd_ref[0, 0:1, :]  # [1, M_pad]
    for h in range(H):
        q = q_ref[0, h]  # [bq, P] — aligned block, no relayout
        s = jax.lax.dot_general(
            q, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + madd  # [bq, M_pad]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l
        o_ref[0, h] = o.astype(o_ref.dtype)


def headsmajor_supported(n: int, m: int, key_mask) -> bool:
    m_pad = max(128, ((m + 127) // 128) * 128)
    return key_mask is not None and n >= 512 and m_pad <= 512


def crossattn_headsmajor(
    q: jnp.ndarray,  # [B, N, H, Dh]
    k: jnp.ndarray,  # [B, M, H, Dh]
    v: jnp.ndarray,
    key_mask: jnp.ndarray,  # [B, M] bool
    block_q: int = 256,
) -> jnp.ndarray:
    """Masked cross-attention, K/V fully VMEM-resident, heads-major layout.

    Forward-only fast path (inference dispatch; training falls back to the
    flat allheads kernel / XLA, which have VJPs). The head transposes in and
    out are HBM-bandwidth bounded (~1 ms at the 1024px op point) and are
    more than paid for by removing the kernel-internal lane relayouts.
    """
    B, N, H, Dh = q.shape
    M = k.shape[1]
    P = 128 if Dh <= 128 else ((Dh + 127) // 128) * 128
    m_pad = max(128, ((M + 127) // 128) * 128)
    bq = min(block_q, max(128, ((N + 127) // 128) * 128))
    n_pad = ((N + bq - 1) // bq) * bq
    qh = _pad_heads(q.transpose(0, 2, 1, 3), P)  # [B, H, N, P]
    kh = _pad_heads(k.transpose(0, 2, 1, 3), P)
    vh = _pad_heads(v.transpose(0, 2, 1, 3), P)
    if n_pad != N:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, n_pad - N), (0, 0)))
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, m_pad - M), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, m_pad - M), (0, 0)))
    madd = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(jnp.float32)
    madd = jnp.pad(madd, ((0, 0), (0, m_pad - M)), constant_values=_NEG_INF)
    madd = jnp.broadcast_to(madd[:, None, :], (B, 8, m_pad))
    scale = Dh**-0.5 * _LOG2E

    out = pl.pallas_call(
        functools.partial(_headsmajor_kernel, scale=scale),
        grid=(B, n_pad // bq),
        in_specs=[
            pl.BlockSpec((1, H, bq, P), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            # K/V index is i-independent: the block stays VMEM-resident
            # across the q sweep for each batch element (no re-fetch)
            pl.BlockSpec((1, H, m_pad, P), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, m_pad, P), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, m_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, bq, P), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, P), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qh, kh, vh, madd)
    return out[:, :, :N, :Dh].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _allheads_core(qf, kf, vf, madd, key_mask, n_heads, d_head, bq):
    return _allheads_fwd_call(qf, kf, vf, madd, n_heads, d_head, bq)


def _allheads_fwd_call(qf, kf, vf, madd, n_heads, d_head, bq):
    B, N, C = qf.shape
    M = kf.shape[1]
    scale = d_head**-0.5 * _LOG2E
    return pl.pallas_call(
        functools.partial(
            _allheads_kernel, n_heads=n_heads, d_head=d_head, scale=scale
        ),
        grid=(B, N // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
    )(qf, kf, vf, madd)


def _allheads_core_fwd(qf, kf, vf, madd, key_mask, n_heads, d_head, bq):
    out = _allheads_fwd_call(qf, kf, vf, madd, n_heads, d_head, bq)
    return out, (qf, kf, vf, key_mask)


def _allheads_core_bwd(n_heads, d_head, bq, res, g):
    # recompute-style backward through the (memory-safe) one-pass path —
    # cross-attention is a small share of the training step
    qf, kf, vf, key_mask = res
    B, N, C = qf.shape
    M = key_mask.shape[1]  # true key count (kf/vf carry a padded tail)
    to4 = lambda x, L: x[:, :L].reshape(B, L, n_heads, d_head)

    def f(qf_, kf_, vf_):
        return onepass_attention(
            to4(qf_, N), to4(kf_, M), to4(vf_, M), key_mask=key_mask
        ).reshape(B, N, C)

    _, vjp = jax.vjp(f, qf, kf, vf)
    dq, dk, dv = vjp(g)  # padded shapes: f slices its padded inputs itself
    return dq, dk, dv, None, None


_allheads_core.defvjp(_allheads_core_fwd, _allheads_core_bwd)


def supported(n: int, m: int, block_q: int = DEFAULT_BLOCK_Q,
              block_k: int = DEFAULT_BLOCK_K) -> bool:
    # arbitrary n/m supported via padding + tail masking; just needs real dims
    return n >= 1 and m >= 1


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention over [B, N, H, Dh] (+[B, M, H, Dh] kv).

    key_mask [B, M] (True = valid) supports masked CROSS-attention (padded
    captions) with ZERO kernel cost: the head-dim padding to the 128-lane
    width leaves free zero lanes, so the additive mask rides in an extra
    feature lane — q gets 1 there, k gets the mask value, and q@k^T picks it
    up inside the existing matmul. Gradients to that lane are discarded by
    the output slice. Requires Dh < padded width (true for PixArt's 72).

    Dense `bias` is not supported — fall back to impl='xla'.
    """
    assert bias is None, "flash kernel: dense bias not implemented; use impl='xla'"
    B, N, H, Dh = q.shape
    M = k.shape[1]
    if block_q is None:
        # v5e measurement at 16k tokens: per-grid-step overhead dominates at
        # 512 tiles (39.3 ms) — 1024x2048 tiles run 2.3x faster (17.0 ms)
        block_q = 1024 if M >= 8192 else DEFAULT_BLOCK_Q
    if block_k is None:
        block_k = 2048 if M >= 8192 else DEFAULT_BLOCK_K
    bq = min(block_q, max(128, ((N + 127) // 128) * 128))
    bk = min(block_k, max(128, ((M + 127) // 128) * 128))
    n_pad = ((N + bq - 1) // bq) * bq
    m_pad = ((M + bk - 1) // bk) * bk

    d_pad = max(128, ((Dh + 127) // 128) * 128)
    if key_mask is not None:
        assert Dh < d_pad, "key_mask needs a spare padded lane (Dh < 128k)"
    # fold the softmax scale (by the TRUE head dim) and log2(e) into q once,
    # instead of rescaling every [BQ, BK] logit tile on the VPU in-kernel
    q = q * jnp.asarray(Dh**-0.5 * _LOG2E, q.dtype)

    def to_bh(x, seq_pad):
        x = x.transpose(0, 2, 1, 3).reshape(B * H, x.shape[1], Dh)
        if seq_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, seq_pad - x.shape[1]), (0, 0)))
        return _pad_heads(x, d_pad)

    q_bh, k_bh, v_bh = to_bh(q, n_pad), to_bh(k, m_pad), to_bh(v, m_pad)
    if key_mask is not None:
        madd = jnp.where(key_mask.astype(bool), 0.0, _NEG_INF).astype(k_bh.dtype)
        madd = jnp.pad(madd, ((0, 0), (0, m_pad - M)))  # pad tail: masked
        madd = jnp.repeat(madd, H, axis=0)  # [B*H, M_pad]
        k_bh = k_bh.at[:, :, d_pad - 1].set(madd)
        q_bh = q_bh.at[:, :, d_pad - 1].set(jnp.asarray(1.0, q_bh.dtype))

    out = _flash_core(q_bh, k_bh, v_bh, 1.0, bq, bk, M)
    out = out[:, :N, :Dh].reshape(B, H, N, Dh).transpose(0, 2, 1, 3)
    return out
