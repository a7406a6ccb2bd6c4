"""Blockwise flash attention as a Pallas TPU kernel, with custom VJP.

Why: XLA's naive attention materializes the [L, L] logits in HBM — for
TinyViT stage-2 that is 640x6x784x784 floats per step (an OOM at batch 40),
and even where it fits, fp32 logits round-trips dominate HBM traffic at
short L. The reference hides the same math inside torch SDPA
(ref: src/models/tiny_vit.py:103); this kernel keeps logits entirely in VMEM
and writes only the output plus a per-row logsumexp.

LAYOUT IS THE POINT. TPU HBM/VMEM layouts tile the last dim to 128 lanes, so
a head-split array [B, L, H, 32] is 4x padded everywhere it touches memory,
and the [B,L,H,d] -> [B*H,L,d] transposes cost ~16 ms per call at TinyViT
shapes (measured). These kernels therefore work on the PACKED layout
[B, L, H*d] — exactly what the fused qkv Dense produces — and slice each
head's d lanes *inside* the kernel (a static lane slice, free). No transposes,
no padding, anywhere.

Shape regime: L <= ~4k, H*d <= ~768 — K/V for one batch row fit in VMEM, so
one exact pass per (q-block, head), no online-softmax accumulation.

Backward avoids cross-grid-cell races by splitting into two kernels:
  - dQ: grid over q-blocks (full K/V resident), using saved LSE
  - dK/dV: grid over kv-blocks (full Q/dO resident), using saved LSE + D
where D = rowsum(dO * O) is one cheap XLA reduction. lse/D are stored
[B, H, L] lane-oriented (a [.., 1]-shaped buffer would be 128x padded).

Matmul operands stay in the input dtype (bf16-in/fp32-accum runs the MXU at
full rate); softmax math is fp32.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block(L: int, Lk: int, H: int, d: int, target: int = 512,
           budget_mb: float = 11.0) -> int:
    """Largest multiple-of-128 divisor of L <= target that fits VMEM.

    Per-cell residents: q/o blocks (bq x H*d), K/V (Lk x H*d), and ~2 live
    fp32 [bq, Lk] logits buffers from the unrolled head loop.
    """
    budget = int(budget_mb * 1024 * 1024)
    fixed = 2 * Lk * H * d * 2  # K and V, bf16
    for b in (512, 384, 256, 128):
        if b > target or L % b:
            continue
        need = fixed + 2 * b * H * d * 2 + 2 * b * Lk * 4
        if need <= budget:
            return b
    return min(L, 128)


# ---------------------------------------------------------------- forward

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, l_kv, H, d):
    lses = []
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * jnp.asarray(scale, q_ref.dtype)  # [bq, d]
        k = k_ref[0, :, sl]                                    # [Lk, d]
        v = v_ref[0, :, sl]                                    # [Lk, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, Lk]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < l_kv, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1, keepdims=True)
        p = (e / denom).astype(v.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lses.append(jnp.transpose(m + jnp.log(denom)))  # [1, bq]
    lse_ref[0] = jnp.concatenate(lses, axis=0)          # [H, bq]


def _fa_fwd_impl(q, k, v, scale, l_kv, H):
    """q: [B, Lq, H*d], k/v: [B, Lk, H*d] (L padded to 128 multiples)."""
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // H
    bq = _block(Lq, Lk, H, d)
    grid = (B, Lq // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, l_kv=l_kv, H=H, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------- backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvo_ref, dq_ref,
               *, scale, l_kv, H, d):
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]                               # [bq, d]
        lse = jnp.transpose(lse_ref[0, h:h + 1])            # [bq, 1]
        dvo = jnp.transpose(dvo_ref[0, h:h + 1])            # [bq, 1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        p = jnp.where(col < l_kv, jnp.exp(s - lse), 0.0)    # [bq, Lk] f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dvo)).astype(k.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvo_ref, dk_ref, dv_ref,
                *, scale, l_kv, H, d):
    kv_start = pl.program_id(1) * k_ref.shape[1]
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * jnp.asarray(scale, q_ref.dtype)  # [Lq, d] (full)
        k = k_ref[0, :, sl]                                    # [bk, d]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]                                  # [Lq, d]
        lse = jnp.transpose(lse_ref[0, h:h + 1])               # [Lq, 1]
        dvo = jnp.transpose(dvo_ref[0, h:h + 1])               # [Lq, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [Lq, bk]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
        p = jnp.where(col < l_kv, jnp.exp(s - lse), 0.0)
        p_lo = p.astype(do.dtype)
        dv = jax.lax.dot_general(p_lo, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [bk, d]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [Lq, bk]
        ds = (p * (dp - dvo)).astype(q.dtype)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [bk, d]
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _fa_bwd_impl(q, k, v, out, lse, do, scale, l_kv, H):
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // H
    # D_h = rowsum(dO_h * O_h) per head: [B, H, Lq], lane-oriented
    dvo = jnp.sum((do.astype(jnp.float32) * out.astype(jnp.float32))
                  .reshape(B, Lq, H, d), axis=-1).transpose(0, 2, 1)

    bq = _block(Lq, Lk, H, d, target=256)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, l_kv=l_kv, H=H, d=d),
        grid=(B, Lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, do, lse, dvo)

    bk = _block(Lk, Lq, H, d, target=256)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, l_kv=l_kv, H=H, d=d),
        grid=(B, Lk // bk),
        in_specs=[
            pl.BlockSpec((1, Lq, HD), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, HD), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lq), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Lq), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, HD), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, do, lse, dvo)
    return dq, dk, dv


# ---------------------------------------------------------------- public ops

@functools.lru_cache(maxsize=None)
def _make_core(l_kv: int, d_real: int, H: int):
    """custom-vjp core over packed [B, L, H*d] arrays, specialized on the
    unpadded kv length, head dim, and head count."""
    scale = 1.0 / math.sqrt(d_real)

    @jax.custom_vjp
    def core(q, k, v):
        out, _ = _fa_fwd_impl(q, k, v, scale, l_kv, H)
        return out

    def core_fwd(q, k, v):
        out, lse = _fa_fwd_impl(q, k, v, scale, l_kv, H)
        return out, (q, k, v, out, lse)

    def core_bwd(res, do):
        q, k, v, out, lse = res
        return _fa_bwd_impl(q, k, v, out, lse, do, scale, l_kv, H)

    core.defvjp(core_fwd, core_bwd)
    return core


def flash_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int) -> jax.Array:
    """Flash attention over PACKED inputs [B, L, H*d] (head h owns lanes
    [h*d, (h+1)*d)) — the layout a fused qkv Dense already produces.
    Returns [B, Lq, H*d]."""
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // num_heads
    q_align = 512 if Lq >= 1024 else 128
    Lq_p = -(-Lq // q_align) * q_align
    Lk_p = -(-Lk // 128) * 128
    qf = _pad_to(q, Lq_p, 1)
    kf = _pad_to(k, Lk_p, 1)
    vf = _pad_to(v, Lk_p, 1)
    out = _make_core(Lk, d, num_heads)(qf, kf, vf)
    return out[:, :Lq]


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, L, H, d] convenience wrapper (same contract as ops.attention
    _sdpa_xla). The reshape to packed [B, L, H*d] is free — the head axis is
    already adjacent to d in memory."""
    B, Lq, H, d = q.shape
    out = flash_attention_packed(
        q.reshape(B, Lq, H * d), k.reshape(B, k.shape[1], H * d),
        v.reshape(B, v.shape[1], H * d), H)
    return out.reshape(B, Lq, H, d)
