"""Shared flax building blocks for the video backbones and decoders.

Behavioral counterparts of the reference's torch blocks (ConvBNAct
ref: src/models/mobilevit.py:9-19; InvertedResidual :22-33; Conv2d_BN/SE/MBConv
ref: src/models/tiny_vit.py:12-56; pre-norm transformer layers
ref: src/models/mobilevit.py:36-57 and torch TransformerEncoderLayer
norm_first used by the MAE decoders). Everything is NHWC, functional, and
dtype-parameterized: params live in fp32, compute runs in ``dtype``
(bfloat16 on TPU so convs/matmuls hit the MXU natively).
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import sdpa

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class StemConvS2D(nn.Module):
    """3x3 / stride-2 conv on a few-channel input via space-to-depth.

    A stride-2 3x3 conv over [B, 2H, 2W, 3] contracts only K = 27 values per
    output — the MXU runs at ~1/20 of peak and the stem conv measured 20+ ms
    of a 231 ms step. Space-to-depth ([B,2H,2W,C] -> [B,H,W,4C]) converts it
    into a stride-1 2x2 conv over 4C channels (K = 16C): identical math via a
    sparse weight rearrangement, ~8x faster on the MXU. Param tree matches
    nn.Conv exactly (kernel [3, 3, C, F]) so checkpoints are unaffected.

    Mapping: out[i,j] = sum_{di,dj} x[2i+di-1, 2j+dj-1] w[di,dj]; with
    x blocked as X[p,q,(a,b,c)] = x[2p+a, 2q+b, c], tap di lands at block
    p = i + (di-1)//2, offset a = (di-1) % 2 — kernel extent 2 with an
    asymmetric (1, 0) pad.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.features), jnp.float32).astype(self.dtype)
        w2 = jnp.zeros((2, 2, 4 * C, self.features), self.dtype)
        for di in range(3):
            for dj in range(3):
                kp, a = (di - 1) // 2 + 1, (di - 1) % 2
                kq, b = (dj - 1) // 2 + 1, (dj - 1) % 2
                w2 = w2.at[kp, kq, (a * 2 + b) * C:(a * 2 + b + 1) * C, :].set(
                    w[di, dj])
        xs = x.astype(self.dtype).reshape(
            B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            xs, w2, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _Conv1x1Params(nn.Module):
    """Declares an nn.Conv([1,1])-compatible kernel and returns it raw —
    the caller does the matmul. Lets moment-BN derive the BN statistics from
    input moments without a pass over the conv output."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (1, 1, in_ch, self.features), jnp.float32)


class _BNParams(nn.Module):
    """nn.BatchNorm-compatible params/stats (scale/bias + mean/var), returned
    raw for the moment-BN path."""

    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> SiLU (optional).

    TPU moment-BN fast path (train-mode 1x1 expand convs): for y = x @ W the
    per-channel batch statistics are linear/quadratic in the INPUT moments —
    mean(y) = mean(x) @ W and E[y^2]_c = w_c^T (x^T x / N) w_c — so they are
    computed from one tiny [Cin, Cin] Gram matmul instead of a full pass over
    the [N, Cout] conv output. The conv output is then consumed exactly once
    by a fused matmul->affine(->act) epilogue: at TinyViT stage-1 shapes that
    removes two ~600 MB HBM trips per expand conv (the stats read and the
    re-read for normalize), the in-situ "BN train stats" cost of
    scripts/probe_mbconv_ablate.py. Autodiff through the moments reproduces
    the exact BN-train gradient — no custom VJP. Applied when Cin <= Cout
    (expand direction: Gram cost N*Cin^2 FLOPs is negligible vs the saved
    N*Cout bytes); param/stat tree is identical to the nn.Conv+nn.BatchNorm
    path, so checkpoints and the torch importer are unaffected.

    OPT-IN (SSL_VIT_TPU_MOMENT_BN=1): the on-chip A/B (scripts/profile_pieces
    full step, B=16) measured 243.4/243.7 ms with moment-BN vs 230.9 ms
    without — XLA already keeps the stats+normalize pass fused with the conv,
    while the Gram matmul adds un-fusable work. Kept (off by default) because
    the algebra is exactness-tested and may win at larger Cout/Cin ratios.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        moment_bn = (train and self.kernel == 1 and self.stride == 1
                     and self.groups == 1 and x.shape[-1] <= self.features
                     and os.environ.get("SSL_VIT_TPU_MOMENT_BN", "0") == "1")
        if moment_bn:
            in_ch = x.shape[-1]
            w = _Conv1x1Params(self.features, name="Conv_0")(in_ch)
            scale, bias, ra_mean, ra_var = _BNParams(
                self.bn_scale_init, name="BatchNorm_0")(self.features)
            wf = w.reshape(in_ch, self.features).astype(jnp.float32)
            # moments straight off the (bf16) activations with f32
            # accumulation — an astype(f32) here would materialize a full
            # f32 copy of x plus its gradient (measured +14 ms/step)
            xf = x.reshape(-1, in_ch)
            n = xf.shape[0]
            mean_x = jnp.mean(xf, axis=0, dtype=jnp.float32)
            gram = jax.lax.dot_general(xf, xf, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32) / n
            mu = mean_x @ wf                                   # [Cout]
            ey2 = jnp.sum((gram @ wf) * wf, axis=0)            # [Cout]
            var = jnp.maximum(ey2 - mu * mu, 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mu
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
            y = x.astype(self.dtype) @ wf.astype(self.dtype)
            inv = jax.lax.rsqrt(var + 1e-5)
            x = (y * (scale * inv).astype(self.dtype)
                 + (bias - mu * scale * inv).astype(self.dtype))
        elif (self.kernel == 3 and self.stride == 2 and self.groups == 1
                and x.shape[-1] <= 4 and x.shape[-3] % 2 == 0
                and x.shape[-2] % 2 == 0):
            x = StemConvS2D(self.features, dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)], feature_group_count=self.groups,
                use_bias=False, dtype=self.dtype,
            )(x)
        if not moment_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, scale_init=self.bn_scale_init,
            )(x)
        if self.act:
            x = nn.silu(x)
        return x


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual: pw-expand -> dw -> pw-project."""

    features: int
    expand: int = 4
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(in_ch * self.expand)
        use_res = self.stride == 1 and in_ch == self.features
        y = ConvBNAct(hidden, kernel=1, dtype=self.dtype)(x, train)
        y = ConvBNAct(hidden, kernel=3, stride=self.stride, groups=hidden, dtype=self.dtype)(y, train)
        y = ConvBNAct(self.features, kernel=1, act=False, dtype=self.dtype)(y, train)
        return x + y if use_res else y


class SELayer(nn.Module):
    """Squeeze-and-excitation (ref: src/models/tiny_vit.py:20-34)."""

    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(-3, -2))  # [B, C]
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class MBConv(nn.Module):
    """TinyViT's MBConv: expand -> dw -> SE -> project, GELU activations,
    zero-init final BN scale (ref: src/models/tiny_vit.py:36-56)."""

    features: int
    expand: int = 4
    stride: int = 1
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand)
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        if self.expand != 1:
            y = ConvBNAct(mid, kernel=1, act=False, dtype=self.dtype)(y, train)
            y = nn.gelu(y)
        y = ConvBNAct(mid, kernel=3, stride=self.stride, groups=mid, act=False, dtype=self.dtype)(y, train)
        y = nn.gelu(y)
        y = SELayer(dtype=self.dtype)(y)
        # Zero-init of the final BN scale is the standard residual-branch
        # trick (block starts as identity). The reference applies it
        # UNCONDITIONALLY (ref: src/models/tiny_vit.py:49 bn_weight_init=0,
        # :152 stride-2 downsample) — but on a non-residual block (stride-2
        # downsample / channel change) it is a structural gradient trap, not
        # an init trick: the block's output is exactly 0 (zero scale, zero
        # bias), so the NEXT zero-scale block sees a constant-zero input
        # (normalized x̂ ≡ 0 ⇒ its scale gradient is exactly 0), while every
        # parameter in between only receives gradient THROUGH that
        # downstream zero scale (also exactly 0). The two dead blocks
        # mutually lock and the network below the first non-residual
        # zero-init block stays input-independent forever — verified
        # empirically: after 60 epochs of MAE pretraining all four zero-init
        # scales were still bit-exact 0.0 and the downstream BN running vars
        # were exactly 0. We therefore zero-init ONLY the residual blocks.
        scale_init = nn.initializers.zeros if use_res else nn.initializers.ones
        y = ConvBNAct(self.features, kernel=1, act=False, dtype=self.dtype,
                      bn_scale_init=scale_init)(y, train)
        if use_res:
            y = DropPath(self.drop_path)(y, deterministic=not train)
            return x + y
        return y


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Dense -> GELU -> Dense with optional dropout."""

    hidden: int
    out: int | None = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MoeMlp(nn.Module):
    """Top-1-routed mixture-of-experts MLP (opt-in, beyond-reference).

    GShard-style static-shape dispatch: every token picks its argmax expert,
    takes a slot in that expert's fixed-capacity buffer (overflow tokens are
    DROPPED — their MoE output is 0, so the block's residual passes them
    through unchanged), and the expert matmuls run via
    parallel/ep.expert_parallel_apply — sharded over an "expert" mesh axis
    when one is installed (set_ep_mesh), plain vmap otherwise.
    Routing/softmax runs in f32; the gate value scales each token's expert
    output (the path through which the router gets gradient).

    Dispatch/combine are one-hot einsums over static shapes, so their cost
    is S*E*C per group of S tokens — quadratic in S if all N = B*L tokens
    route as one group (C grows with S). ``group_size`` bounds that the
    GShard way: tokens route within fixed groups of S tokens, capacity
    C = ceil(S/E * capacity_factor) is per-group, and the expert matmuls
    still run as one dense [E, G*C, D] x [D, H] x [H, D] bank apply.
    group_size=0 (default) routes all tokens as one group — fine for tests
    and small models; production decoder configs should set a divisor of
    the per-clip token count (e.g. 392 for the 3136-token decoder).
    """

    hidden: int
    num_experts: int
    capacity_factor: float = 2.0
    group_size: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..parallel.ep import expert_parallel_apply

        B, L, D = x.shape
        N, E, H = B * L, self.num_experts, self.hidden
        if self.group_size > 0 and N % self.group_size:
            # refuse rather than silently fall back to one N-token group:
            # flat capacity C grows with N, so the [S, E, C] dispatch
            # one-hot would go QUADRATIC in tokens (tens of GB at
            # production shapes) with no diagnostic
            raise ValueError(
                f"moe group_size={self.group_size} must divide the token "
                f"count B*L={N} (got B={B}, L={L}); pick a divisor of the "
                "per-clip token count")
        S = self.group_size if self.group_size > 0 else N
        G = N // S
        C = max(1, int(-(-S * self.capacity_factor // E)))
        xt = x.reshape(N, D)

        logits = nn.Dense(E, dtype=jnp.float32, name="router")(
            xt.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)                 # [N, E]
        gate = jnp.max(probs, axis=-1)                          # top-1 prob
        onehot = jax.nn.one_hot(jnp.argmax(probs, axis=-1), E,
                                dtype=jnp.float32).reshape(G, S, E)
        # Switch-style load-balance auxiliary: E * sum_e f_e * P_e, where
        # f_e = fraction of tokens argmax-routed to e (pre-capacity) and
        # P_e = mean router prob mass on e. Minimum 1.0 at perfect balance;
        # differentiable through P_e. Consumed by the train step via
        # mutable=["intermediates"] when moe_aux_weight > 0.
        aux = E * jnp.sum(jnp.mean(onehot.reshape(N, E), axis=0)
                          * jnp.mean(probs, axis=0))
        self.sow("intermediates", "moe_aux_loss", aux)
        pos = jnp.cumsum(onehot, axis=1) - 1.0                  # slot in group
        keep = (pos < C).astype(jnp.float32) * onehot
        dispatch = keep[..., None] * jax.nn.one_hot(
            pos.astype(jnp.int32), C, dtype=jnp.float32)        # [G, S, E, C]
        dispatch = dispatch.astype(self.dtype)

        xg = xt.reshape(G, S, D).astype(self.dtype)
        expert_in = jnp.einsum("gsec,gsd->egcd", dispatch,
                               xg).reshape(E, G * C, D)
        init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", batch_axis=(0,))
        zeros = nn.initializers.zeros
        bank = {"w1": self.param("w1", init, (E, D, H)),
                "b1": self.param("b1", zeros, (E, H)),
                "w2": self.param("w2", init, (E, H, D)),
                "b2": self.param("b2", zeros, (E, D))}
        bank = jax.tree.map(lambda a: a.astype(self.dtype), bank)

        def mlp_fn(p, xin):  # one expert: [G*C, D] -> [G*C, D]
            h = nn.gelu(xin @ p["w1"] + p["b1"])
            return h @ p["w2"] + p["b2"]

        out = expert_parallel_apply(mlp_fn, bank, expert_in)    # [E, G*C, D]
        out = out.reshape(E, G, C, D)
        combine = dispatch * gate.reshape(G, S)[:, :, None, None].astype(
            self.dtype)
        y = jnp.einsum("gsec,egcd->gsd", combine, out)
        return y.reshape(B, L, D).astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """Fused-QKV multi-head self-attention over [B, L, D].

    ``key_dim`` decouples per-head width from dim/num_heads, matching
    TinyViT's Attention (ref: src/models/tiny_vit.py:86-106).
    """

    num_heads: int
    key_dim: int | None = None
    out_dim: int | None = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import resolve_impl
        B, L, D = x.shape
        kd = self.key_dim or D // self.num_heads
        out_dim = self.out_dim or D
        HD = self.num_heads * kd
        qkv = nn.Dense(3 * HD, dtype=self.dtype, name="qkv")(x)
        impl = resolve_impl(self.attn_impl, L)
        if impl == "sp":
            # sequence parallel: queries sharded over the registered seq
            # mesh, K/V all-gathered over ICI, packed kernel per shard
            # (parallel/sp.py) — the user-reachable long-clip path
            # (model.sequence_parallel: true)
            from ..ops.attention import get_sp_mesh
            from ..parallel.sp import sp_attention_packed
            mesh, axis = get_sp_mesh()
            o = sp_attention_packed(
                qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:],
                self.num_heads, mesh, axis)
        elif impl == "pallas":
            # packed-head path: thirds of the fused qkv output are contiguous
            # [B, L, H*kd] slices — no head-split reshape, no transposes, no
            # 4x lane padding (see ops/flash_attention.py docstring)
            from ..ops.flash_attention import flash_attention_packed
            o = flash_attention_packed(
                qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:],
                self.num_heads)
        else:
            qkv = qkv.reshape(B, L, 3, self.num_heads, kd)
            o = sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], impl="xla")
            o = o.reshape(B, L, HD)
        return nn.Dense(out_dim, dtype=self.dtype, name="proj")(o)


class TransformerBlock(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x)).

    Used (with different widths) by MobileViT blocks, TinyViT stages, the
    temporal SSL transformer, and both MAE decoders.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    key_dim: int | None = None
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None
    moe_experts: int = 0  # >0: MoeMlp instead of the dense MLP (opt-in EP)
    moe_capacity_factor: float = 2.0
    moe_group_size: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D = x.shape[-1]
        # epsilon=1e-5 matches torch nn.LayerNorm (flax defaults to 1e-6).
        # This matters beyond parity: TinyViT's stride-2 downsample MBConv
        # zero-inits its projection BN scale (ref: src/models/tiny_vit.py:50,
        # faithfully reproduced), so at init the transformer stages see a
        # constant input, LN variance is ~0, and each LN backward amplifies
        # by ~rsqrt(eps); at 1e-6 the 12-LN chain overflows f32 to inf.
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = MultiHeadAttention(self.num_heads, key_dim=self.key_dim, dtype=self.dtype,
                               attn_impl=self.attn_impl)(h)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.moe_experts:
            h = MoeMlp(int(D * self.mlp_ratio), self.moe_experts,
                       self.moe_capacity_factor, self.moe_group_size,
                       dtype=self.dtype)(h, deterministic)
        else:
            h = Mlp(int(D * self.mlp_ratio), dropout=self.dropout, dtype=self.dtype)(h, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Stack of pre-norm TransformerBlocks (torch TransformerEncoder equivalent)."""

    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0
    moe_group_size: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            x = TransformerBlock(
                self.num_heads, mlp_ratio=self.mlp_ratio, dropout=self.dropout,
                dtype=self.dtype, attn_impl=self.attn_impl,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_group_size=self.moe_group_size, name=f"block{i}",
            )(x, deterministic)
        return x


def adaptive_avg_pool_nhwc(x: jax.Array, out_size: int) -> jax.Array:
    """Adaptive average pool [B, H, W, C] -> [B, s, s, C] (torch semantics)."""
    B, H, W, C = x.shape
    s = out_size
    if H == s and W == s:
        return x
    if H % s == 0 and W % s == 0:
        return jnp.mean(x.reshape(B, s, H // s, s, W // s, C), axis=(2, 4))
    # General case: torch-style variable bins [floor(i*H/s), ceil((i+1)*H/s))
    out = []
    for i in range(s):
        h0, h1 = (i * H) // s, -(-((i + 1) * H) // s)
        row = []
        for j in range(s):
            w0, w1 = (j * W) // s, -(-((j + 1) * W) // s)
            row.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        out.append(jnp.stack(row, axis=1))
    return jnp.stack(out, axis=1)
