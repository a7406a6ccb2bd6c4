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

Backward is ONE fused kernel: grid over q-blocks with K/V resident, dQ
written per block, and dK/dV accumulated in fp32 VMEM scratch across the
(sequential on TPU) grid steps, flushed on the last q-block. This computes
the minimal 5 matmuls per (head, q-block) — S, dP, dQ, dK, dV — where the
previous two-kernel split (dQ grid + dKV grid) recomputed S and dP in both,
7 matmuls total, and re-streamed full Q/dO per kv-block: measured 3.4x the
forward; the fused kernel is ~2.3x. D = rowsum(dO * O) is one cheap XLA
reduction. lse/D are stored [B, H, L] lane-oriented (a [.., 1]-shaped buffer
would be 128x padded).

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

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvo_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, l_q, l_kv, H, d, nq):
    """Fused dQ/dK/dV: one pass over q-blocks, K/V resident.

    dK/dV accumulate in fp32 VMEM scratch across the sequential grid steps
    of each batch row and flush to the (revisited) output block on the last
    q-block. Five matmuls per (head, q-block): S, dP, dQ, dK, dV.
    """
    i = pl.program_id(1)
    q_start = i * q_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl] * jnp.asarray(scale, q_ref.dtype)  # [bq, d]
        k = k_ref[0, :, sl]                                    # [Lk, d]
        v = v_ref[0, :, sl]
        do = do_ref[0, :, sl]                                  # [bq, d]
        lse = jnp.transpose(lse_ref[0, h:h + 1])               # [bq, 1]
        dvo = jnp.transpose(dvo_ref[0, h:h + 1])               # [bq, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq, Lk]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_start
        valid = (col < l_kv) & (row < l_q)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)            # [bq, Lk] f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = jnp.where(valid, p * (dp - dvo), 0.0)
        ds_lo = ds.astype(k.dtype)
        dq = jax.lax.dot_general(ds_lo, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)
        # dk = ds^T @ (q*scale); dv = p^T @ dO — accumulated across q-blocks
        dk_acc[:, sl] += jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Lk, d]
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [Lk, d]

    @pl.when(i == nq - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _block_bwd(L: int, Lk: int, H: int, d: int, budget_mb: float = 60.0) -> int:
    """q-block size for the fused backward: bq x Lk fp32 buffers (~3 live)
    plus resident K/V (bf16) and fp32 dK/dV scratch."""
    budget = int(budget_mb * 1024 * 1024)
    fixed = 2 * Lk * H * d * 2 + 2 * Lk * H * d * 4  # K,V bf16 + dK,dV f32
    for b in (512, 384, 256, 128):
        if L % b:
            continue
        need = fixed + 4 * b * H * d * 2 + 3 * b * Lk * 4
        if need <= budget:
            return b
    return min(L, 128)


def _fa_bwd_impl(q, k, v, out, lse, do, scale, l_q, l_kv, H):
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // H
    # D_h = rowsum(dO_h * O_h) per head: [B, H, Lq], lane-oriented
    dvo = jnp.sum((do.astype(jnp.float32) * out.astype(jnp.float32))
                  .reshape(B, Lq, H, d), axis=-1).transpose(0, 2, 1)

    bq = _block_bwd(Lq, Lk, H, d)
    nq = Lq // bq
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, l_q=l_q, l_kv=l_kv,
                          H=H, d=d, nq=nq),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lk, HD), jnp.float32),
            pltpu.VMEM((Lk, HD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v, do, lse, dvo)
    return dq, dk, dv


# ---------------------------------------------------------------- public ops

@functools.lru_cache(maxsize=None)
def _make_core(l_q: int, l_kv: int, d_real: int, H: int):
    """custom-vjp core over packed [B, L, H*d] arrays, specialized on the
    unpadded q/kv lengths, head dim, and head count."""
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
        return _fa_bwd_impl(q, k, v, out, lse, do, scale, l_q, l_kv, H)

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
    # Align Lq so large q-blocks divide it: a 784->896 pad only admits
    # bq=128 (7 small grid cells); 784->1024 admits bq=512 (2 cells), which
    # measures faster despite the extra masked rows.
    q_align = 512 if Lq >= 512 else 256 if Lq >= 256 else 128
    Lq_p = -(-Lq // q_align) * q_align
    Lk_p = -(-Lk // 128) * 128
    qf = _pad_to(q, Lq_p, 1)
    kf = _pad_to(k, Lk_p, 1)
    vf = _pad_to(v, Lk_p, 1)
    out = _make_core(Lq, Lk, d, num_heads)(qf, kf, vf)
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
