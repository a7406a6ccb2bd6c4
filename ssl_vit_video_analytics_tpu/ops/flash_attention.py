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
reduction. lse/D are stored [B, L, H]: q-rows on sublanes (so non-128 q-block
sizes stay legal), heads on lanes, head reads are static lane slices.

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


@functools.lru_cache(maxsize=None)
def _plan(Lq: int, Lk_p: int, H: int, d: int,
          budget_mb: float = 60.0) -> tuple[int, int]:
    """(bq, Lq_padded): q-block size minimizing Lq padding under VMEM.

    Only SUBLANE alignment (multiple of 8) is required of the q-rows dim — a
    multiple-of-128 restriction forced padding 784->1024 (+30% rows at
    stage 2), 3136->3584 (+14%, decoder), 196->256 (+30%, stage 3), and every
    padded row pays matmul AND exp cost in both directions. Picks the fewest
    blocks nq with bq = roundup8(ceil(Lq/nq)) <= 512 fitting the budget
    (fatter blocks stopped helping); nq=1 keeps G-batching eligible.

    Sized against the fused BACKWARD's working set (the tighter of the two):
    resident K/V bf16 + fp32 dK/dV scratch + expanded K/V, ~3 live fp32
    [bq, gs*Lk] buffers + q/do/dq/o blocks. Forward reuses the same bq so
    one padding serves both kernels.
    """
    budget = int(budget_mb * 1024 * 1024)
    gs = max(1, min(H, 128 // max(d, 1)))
    fixed = (2 * Lk_p * H * d * 2 + 2 * Lk_p * H * d * 4
             + 2 * gs * Lk_p * gs * d * 2)
    per_b = 4 * H * d * 2 + 3 * gs * Lk_p * 4
    for nq in range(1, 512):
        bq = -(-(-(-Lq // nq)) // 8) * 8
        if bq > 512:
            continue
        if fixed + per_b * bq <= budget:
            return bq, nq * bq
    return 128, -(-Lq // 128) * 128


def _gbatch(B: int, Lq_p: int, Lk: int, H: int, d: int,
            budget_mb: float = 40.0, bwd: bool = False) -> int:
    """Batch-rows-per-grid-cell for SHORT sequences.

    At L <= 512 a (B, 1) grid of one-row cells is overhead-bound: TinyViT
    stage 3 (BT=256 rows, L=196, 12 heads of 32) measured ~4% MXU — the
    per-cell prologue/DMA sequencing dwarfs the 12 tiny matmuls. Processing G
    rows per cell amortizes that fixed cost G-fold while keeping the same
    math. Returns the largest G in {8,4,2,1} that divides B and fits VMEM
    (K/V/q/o/lse blocks scale with G; the live logits buffers do not — the
    (g, h) loop is sequential)."""
    if Lq_p > 512 or Lk > 1024:
        return 1
    budget = int(budget_mb * 1024 * 1024)
    gs = max(1, min(H, 128 // max(d, 1)))
    per_row = 2 * Lk * H * d * 2 + 2 * Lq_p * H * d * 2  # K,V,q,o bf16
    if bwd:
        per_row += 2 * Lk * H * d * 4 + 2 * Lq_p * H * d * 2  # dK/dV scratch + do/dq
    live = 3 * Lq_p * gs * Lk * 4 + 2 * gs * Lk * gs * d * 2
    for g in (8, 4, 2, 1):
        if B % g == 0 and g * per_row + live <= budget:
            return g
    return 1


# ---------------------------------------------------------------- forward

def _groups(H: int, d: int) -> list[tuple[int, int]]:
    """Split H heads into MXU-width groups: gs = min(H, 128 // d) heads are
    processed per matmul (plus a remainder group). Returns [(h0, gs), ...]."""
    gs = max(1, min(H, 128 // max(d, 1)))
    out = []
    h = 0
    while h < H:
        out.append((h, min(gs, H - h)))
        h += gs
    return out


def _expand_heads(x, gs: int, d: int):
    """[Lk, gs*d] -> sublane-stacked, lane-masked [gs*Lk, gs*d]: row block j
    holds head j's values in its own d lanes and ZEROS elsewhere.

    This is the head-group packing trick: a dot against the expanded operand
    contracts over the full gs*d lanes, and the zero blocks kill every
    cross-head term — gs small K=d matmuls (fill/drain-bound on the MXU at
    d=32) become ONE K=gs*d matmul at gs x the FLOPs but ~gs x the efficiency
    and 1/gs the op-issue count. No transposes anywhere."""
    if gs == 1:
        return x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.concatenate(
        [jnp.where((lane >= j * d) & (lane < (j + 1) * d), x, 0)
         for j in range(gs)], axis=0)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, l_kv, H, d, G):
    Lk = k_ref.shape[1]
    for g in range(G):
        lses = [None] * H
        for h0, gs in _groups(H, d):
            sl = slice(h0 * d, (h0 + gs) * d)
            q = q_ref[g, :, sl] * jnp.asarray(scale, q_ref.dtype)  # [bq, gs*d]
            k_exp = _expand_heads(k_ref[g, :, sl], gs, d)          # [gs*Lk, gs*d]
            v_exp = _expand_heads(v_ref[g, :, sl], gs, d)
            s_all = jax.lax.dot_general(q, k_exp, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)  # [bq, gs*Lk]
            # (An explicit two-phase issue-all-S-then-softmax schedule was
            # measured identical — Mosaic already overlaps groups.)
            ps, invs = [], []
            for j in range(gs):
                s = s_all[:, j * Lk:(j + 1) * Lk]
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < l_kv, s, NEG_INF)
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                denom = jnp.sum(e, axis=1, keepdims=True)
                # normalization deferred past the AV matmul: dividing o
                # [bq, gs*d] is ~Lk/d fewer VPU ops than dividing e [bq, Lk]
                ps.append(e.astype(v_exp.dtype))
                invs.append(jnp.broadcast_to(1.0 / denom, (e.shape[0], d)))
                lses[h0 + j] = m + jnp.log(denom)                  # [bq, 1]
            p_all = ps[0] if gs == 1 else jnp.concatenate(ps, axis=1)
            o = jax.lax.dot_general(p_all, v_exp, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)  # [bq, gs*d] packed
            inv_all = invs[0] if gs == 1 else jnp.concatenate(invs, axis=1)
            o_ref[g, :, sl] = (o * inv_all).astype(o_ref.dtype)
        lse_ref[g] = jnp.concatenate(lses, axis=1)          # [bq, H]


def _fa_fwd_impl(q, k, v, scale, l_kv, H, bq):
    """q: [B, Lq, H*d] (Lq = nq*bq), k/v: [B, Lk, H*d] (Lk 128-padded)."""
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // H
    G = _gbatch(B, Lq, Lk, H, d) if Lq == bq else 1
    grid = (B // G, Lq // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, l_kv=l_kv, H=H, d=d, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            # lse is [B, Lq, H]: q-rows on SUBLANES so non-128 bq blocks are
            # legal (lane dim H is always the full array dim)
            pl.BlockSpec((G, bq, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lq, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------- backward

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvo_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, H, d, nq, G):
    """Fused dQ/dK/dV: one pass over q-blocks, K/V resident.

    dK/dV accumulate in fp32 VMEM scratch across the sequential grid steps
    of each batch row and flush to the (revisited) output block on the last
    q-block. Five matmuls per (batch row, head, q-block): S, dP, dQ, dK, dV.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    Lk = k_ref.shape[1]
    for g in range(G):
        for h0, gs in _groups(H, d):
            sl = slice(h0 * d, (h0 + gs) * d)
            q = q_ref[g, :, sl] * jnp.asarray(scale, q_ref.dtype)  # [bq, gs*d]
            do = do_ref[g, :, sl]                                  # [bq, gs*d]
            k_exp = _expand_heads(k_ref[g, :, sl], gs, d)          # [gs*Lk, gs*d]
            v_exp = _expand_heads(v_ref[g, :, sl], gs, d)

            # S and dP for the whole group in one K=gs*d dot each; the zero
            # blocks in k_exp/v_exp make every cross-head column exact.
            s_all = jax.lax.dot_general(q, k_exp, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)  # [bq, gs*Lk]
            dp_all = jax.lax.dot_general(do, v_exp, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            ps, dss = [], []
            for j in range(gs):
                s = s_all[:, j * Lk:(j + 1) * Lk]
                dp = dp_all[:, j * Lk:(j + 1) * Lk]
                lse = lse_ref[g, :, h0 + j:h0 + j + 1]              # [bq, 1]
                dvo = dvo_ref[g, :, h0 + j:h0 + j + 1]              # [bq, 1]
                # No validity masks needed (saves 2 [bq, Lk] where-passes +
                # 2 iotas per head): padded K/V rows are ZEROS, so dp=0 and
                # k_exp rows=0 kill every padded-column term before it can
                # reach dq, and padded-column dk/dv rows are sliced off by
                # the caller; padded q rows have do=0 => dvo=0 => ds=0, and
                # their dq rows are sliced off too.
                p = jnp.exp(s - lse)                                # [bq, Lk] f32
                ds = p * (dp - dvo)
                ps.append(p)
                dss.append(ds)
            p_all = (ps[0] if gs == 1 else jnp.concatenate(ps, axis=1)).astype(do.dtype)
            ds_all = (dss[0] if gs == 1 else jnp.concatenate(dss, axis=1)).astype(k_exp.dtype)

            # dQ: one K=gs*Lk dot; k_exp zeros keep heads separate -> packed
            dq = jax.lax.dot_general(ds_all, k_exp, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # [bq, gs*d]
            dq_ref[g, :, sl] = (dq * scale).astype(dq_ref.dtype)
            # dK/dV: contract over bq -> [gs*Lk, gs*d]; only each head's own
            # diagonal (rows j*Lk.., lanes j*d..) is valid, the rest is
            # cross-head garbage we never read.
            dk_all = jax.lax.dot_general(ds_all, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            dv_all = jax.lax.dot_general(p_all, do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            if gs == 1:
                dk_acc[g, :, sl] += dk_all
                dv_acc[g, :, sl] += dv_all
            else:
                for j in range(gs):
                    hsl = slice((h0 + j) * d, (h0 + j + 1) * d)
                    jsl = slice(j * d, (j + 1) * d)
                    dk_acc[g, :, hsl] += dk_all[j * Lk:(j + 1) * Lk, jsl]
                    dv_acc[g, :, hsl] += dv_all[j * Lk:(j + 1) * Lk, jsl]

    @pl.when(i == nq - 1)
    def _flush():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _fa_bwd_impl(q, k, v, out, lse, do, scale, l_q, l_kv, H, bq):
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    d = HD // H
    # D_h = rowsum(dO_h * O_h) per head: [B, Lq, H] — same q-rows-on-sublanes
    # layout as lse, no transpose
    dvo = jnp.sum((do.astype(jnp.float32) * out.astype(jnp.float32))
                  .reshape(B, Lq, H, d), axis=-1)

    nq = Lq // bq
    G = _gbatch(B, Lq, Lk, H, d, bwd=True) if nq == 1 else 1
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, H=H, d=d, nq=nq, G=G),
        grid=(B // G, nq),
        in_specs=[
            pl.BlockSpec((G, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bq, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bq, H), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, bq, HD), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Lk, HD), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Lk, HD), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, Lk, HD), jnp.float32),
            pltpu.VMEM((G, Lk, HD), jnp.float32),
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
    Lk_p = -(-l_kv // 128) * 128
    bq, _ = _plan(l_q, Lk_p, H, d_real)

    @jax.custom_vjp
    def core(q, k, v):
        out, _ = _fa_fwd_impl(q, k, v, scale, l_kv, H, bq)
        return out

    def core_fwd(q, k, v):
        out, lse = _fa_fwd_impl(q, k, v, scale, l_kv, H, bq)
        return out, (q, k, v, out, lse)

    def core_bwd(res, do):
        q, k, v, out, lse = res
        return _fa_bwd_impl(q, k, v, out, lse, do, scale, l_q, l_kv, H, bq)

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
    Lk_p = -(-Lk // 128) * 128
    # Minimal-pad plan: Lq padded only to nq * roundup8(Lq/nq) (784 stays
    # 784 as 2x392, 3136 stays 3136 as 7x448, 196 -> 200) — every padded
    # q-row costs matmul + exp in BOTH kernels; the old multiple-of-128
    # alignment paid +14..30% rows. K stays 128-padded: per-head lane slices
    # of the [bq, gs*Lk] logits must hit tile boundaries.
    bq, Lq_p = _plan(Lq, Lk_p, num_heads, d)
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
