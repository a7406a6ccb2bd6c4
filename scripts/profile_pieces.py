"""Per-piece fwd+bwd timing of the pipeline-B train step on the real chip.

Times each architectural piece in isolation (jitted value_and_grad over a
sum-reduction, train-mode batch stats mutable) so BENCH.md's where-the-time-
goes table stays honest.

Run: `python scripts/profile_pieces.py [B] [piece,piece,...]`
pieces: full patch stage1 stage2 stage3 decoder attn block mbconv ssla pipec matmul (default: all)

Sync note: float(x) per window — block_until_ready does not sync through the
axon tunnel (CLAUDE.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.models.tiny_vit import PatchEmbed, TinyViTStage
from ssl_vit_video_analytics_tpu.models.layers import TransformerEncoder
from ssl_vit_video_analytics_tpu.ops.flash_attention import flash_attention_packed
from ssl_vit_video_analytics_tpu.ops.attention import sdpa


def bench(fn, *args, warmup=2, iters=10, tag=""):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{tag:42s} {dt:9.2f} ms", flush=True)
    return dt


def train_bench(module, x, tag, train_kw="train", **call_kw):
    """fwd+bwd of sum(module(x)) in train mode."""
    key = jax.random.key(0)
    variables = jax.jit(lambda k: module.init(k, x, **call_kw))(key)
    params = variables["params"]
    bs = variables.get("batch_stats")
    if train_kw == "train":
        mode = {"train": True}
    elif train_kw is None:
        mode = {}
    else:
        mode = {"deterministic": False}

    def loss_fn(p, xx):
        v = {"params": p}
        if bs is not None:
            v["batch_stats"] = bs
            out, _ = module.apply(v, xx, mutable=["batch_stats"],
                                  **mode, **call_kw)
        else:
            out = module.apply(v, xx, **mode, **call_kw)
        return jnp.sum(out.astype(jnp.float32))

    def step(p, xx):
        return jax.value_and_grad(loss_fn)(p, xx)

    return bench(step, params, x, tag=tag)


def run_full(B, T, S, dtype, rng):
    from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state, make_optimizer
    from ssl_vit_video_analytics_tpu.utils.config import load_config
    cfg = load_config("configs/ssl_mae.yaml", base="configs/base.yaml")
    cfg["model"]["use_checkpoint"] = False
    model = build_model(cfg, dtype)
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    L = (S // 8) ** 2
    variables = jax.jit(lambda k: model.init(k, clip0, jnp.zeros((B, T, L), bool)))(
        jax.random.key(0))
    tx = make_optimizer(1e-3, weight_decay=0.05, grad_clip=1.0)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step_fn = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8,
                                  norm_pix_loss=True, compute_dtype=dtype)
    batch = {"clip": jax.device_put(
        rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8))}
    k = jax.random.key(1)
    for _ in range(3):
        state, metrics = step_fn(state, batch, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = step_fn(state, batch, k)
    float(metrics["loss"])
    full = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"{'FULL train step':42s} {full:9.2f} ms  "
          f"({B / (full / 1000.0):.1f} clips/s)", flush=True)


def run_ssla(dtype, rng):
    """Pipeline-A (SSL teacher-student) step at the reference's headline
    config: bs=48, T=32, 112^2 (ref logs/train_ssl.log: 144 steps x bs48 in
    58-70 s => 99-119 clips/s on an RTX-class GPU)."""
    from ssl_vit_video_analytics_tpu.models.temporal import TemporalSSL
    from ssl_vit_video_analytics_tpu.train.ssl_engine import make_ssl_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state, make_optimizer
    B, T, S = 48, 32, 112
    model = TemporalSSL(embed_dim=256, layers=4, heads=4, clip_len=T, dtype=dtype)
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, clip0, method="init_all"))(
        jax.random.key(0))
    tx = make_optimizer(1e-3, weight_decay=0.05, grad_clip=1.0)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"),
                               ema_params=jax.tree.map(jnp.copy, variables["params"]))
    ssl_cfg = {"mask_ratio": 0.75, "mfm_weight": 1.0, "var_weight": 25.0,
               "top_weight": 1.0, "top_subsample": 0.5}
    step_fn = make_ssl_step(model, tx, ssl_cfg, with_top=True, compute_dtype=dtype)
    batch = {"clip": jax.device_put(
        rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8))}
    k = jax.random.key(1)
    for _ in range(3):
        state, metrics = step_fn(state, batch, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = step_fn(state, batch, k)
    float(metrics["loss"])
    full = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"{'SSL-A step (bs48, T=32, +TOP)':42s} {full:9.2f} ms  "
          f"({B / (full / 1000.0):.1f} clips/s; ref GPU 99-119)", flush=True)


def run_pipec(dtype, rng):
    """Pipeline-C (feature-token MAE) step at the production config:
    bs=256, T=32, 112^2, stage4_pool 3 (9 tokens/frame), tube mask."""
    from ssl_vit_video_analytics_tpu.entry.train_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_token_mae_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state, make_optimizer
    from ssl_vit_video_analytics_tpu.utils.config import load_config
    cfg = load_config("configs/mae_train.yaml", base="configs/base.yaml")
    cfg.setdefault("model", {})["use_checkpoint"] = True  # production remat; no-remat OOMs at BT=2048
    B, T, S = 32, 32, 112   # production bs 256 runs as accum microbatches; clips/s
    # is the metric, not bs parity (grad_accum does not change FLOPs/clip)
    model = build_model(cfg, dtype)
    tokens_per_frame = int(cfg["mae"].get("stage4_pool", 3)) ** 2
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    N = T * tokens_per_frame
    variables = jax.jit(lambda k: model.init(
        k, clip0, jnp.zeros((B, N), bool)))(jax.random.key(0))
    tx = make_optimizer(3e-4, weight_decay=0.05, grad_clip=1.0)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step_fn = make_token_mae_step(model, tx, tokens_per_frame,
                                  mask_mode="tube", loss_type="l2",
                                  normalize_target=True, compute_dtype=dtype)
    batch = {"clip": jax.device_put(
        rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8))}
    k = jax.random.key(1)
    mr = jnp.float32(0.8)
    for _ in range(3):
        state, metrics = step_fn(state, batch, k, mr)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, metrics = step_fn(state, batch, k, mr)
    float(metrics["loss"])
    full = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"{'pipeline-C step (bs32, T=32)':42s} {full:9.2f} ms  "
          f"({B / (full / 1000.0):.1f} clips/s)", flush=True)


def run_attn_micro(B, BT, dtype, rng):
    def pallas_case(x, H):
        def f(qq):
            return jnp.sum(flash_attention_packed(qq, qq, qq, H).astype(jnp.float32))
        return jax.value_and_grad(f)(x)

    def xla_case(x, H, L):
        def f(qq):
            r = qq.reshape(qq.shape[0], L, H, qq.shape[-1] // H)
            return jnp.sum(sdpa(r, r, r, impl="xla").astype(jnp.float32))
        return jax.value_and_grad(f)(x)

    q2 = jnp.asarray(rng.standard_normal((BT, 784, 192)), dtype)
    bench(lambda x: pallas_case(x, 6), q2, tag="attn stage2 pallas [BT,784,6x32]")
    bench(lambda x: xla_case(x, 6, 784), q2, tag="attn stage2 xla    [BT,784,6x32]")

    q3 = jnp.asarray(rng.standard_normal((BT, 196, 384)), dtype)
    bench(lambda x: pallas_case(x, 12), q3, tag="attn stage3 pallas [BT,196,12x32]")
    bench(lambda x: xla_case(x, 12, 196), q3, tag="attn stage3 xla    [BT,196,12x32]")

    qd = jnp.asarray(rng.standard_normal((B, 3136, 384)), dtype)
    bench(lambda x: pallas_case(x, 6), qd, tag="attn decoder pallas [B,3136,6x64]")
    bench(lambda x: xla_case(x, 6, 3136), qd, tag="attn decoder xla    [B,3136,6x64]")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    def want(name):
        return only is None or name in only

    T, S = 16, 112
    BT = B * T
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    print(f"backend={jax.default_backend()} B={B} BT={BT} dtype={dtype.__name__}",
          flush=True)
    rng = np.random.default_rng(0)

    if want("full"):
        run_full(B, T, S, dtype, rng)

    if want("patch"):
        x_img = jnp.asarray(rng.standard_normal((BT, S, S, 3)), dtype)
        train_bench(PatchEmbed(96, dtype=dtype), x_img, "patch_embed [BT,112,112,3]")

    if want("stage1") or want("stage2"):
        x56 = jnp.asarray(rng.standard_normal((BT, 56, 56, 96)), dtype)
        if want("stage1"):
            train_bench(TinyViTStage(dim=96, depth=2, num_heads=3, downsample=False,
                                     conv_only=True, drop_paths=(0.0, 0.0), dtype=dtype),
                        x56, "stage1 2xMBConv @56^2 d96")
        if want("stage2"):
            train_bench(TinyViTStage(dim=192, depth=2, num_heads=6, downsample=True,
                                     conv_only=False, drop_paths=(0.0, 0.0), dtype=dtype),
                        x56, "stage2 down+2xattn @28^2 d192")

    if want("stage3"):
        x28 = jnp.asarray(rng.standard_normal((BT, 28, 28, 192)), dtype)
        train_bench(TinyViTStage(dim=384, depth=6, num_heads=12, downsample=True,
                                 conv_only=False, drop_paths=(0.0,) * 6, dtype=dtype),
                    x28, "stage3 down+6xattn @14^2 d384")

    if want("decoder"):
        xdec = jnp.asarray(rng.standard_normal((B, T * 196, 384)), dtype)
        train_bench(TransformerEncoder(4, 6, mlp_ratio=4.0, dtype=dtype),
                    xdec, "decoder 4L x 3136 tok d384", train_kw="deterministic")

    if want("attn"):
        run_attn_micro(B, BT, dtype, rng)

    if want("ssla"):
        run_ssla(dtype, rng)

    if want("pipec"):
        run_pipec(dtype, rng)

    if want("block"):
        from flax import linen as nn
        from ssl_vit_video_analytics_tpu.models.layers import (
            TransformerBlock, Mlp, MultiHeadAttention)
        for tag, (L, D, Hh, kd, rows) in {
            "s2": (784, 192, 6, 32, BT),
            "s3": (196, 384, 12, 32, BT),
            "dec": (3136, 384, 6, 64, B),
        }.items():
            xb = jnp.asarray(rng.standard_normal((rows, L, D)), dtype)
            train_bench(TransformerBlock(Hh, key_dim=kd, dtype=dtype),
                        xb, f"block {tag} [{rows},{L},{D}]", train_kw="deterministic")
            train_bench(MultiHeadAttention(Hh, key_dim=kd, dtype=dtype),
                        xb, f"  attn+qkv+proj {tag}", train_kw=None)
            train_bench(Mlp(4 * D, dtype=dtype), xb, f"  mlp {tag}",
                        train_kw="deterministic")
            train_bench(nn.LayerNorm(dtype=dtype), xb, f"  ln {tag}",
                        train_kw=None)

    if want("mbconv"):
        from ssl_vit_video_analytics_tpu.models.layers import ConvBNAct, SELayer, MBConv
        x56 = jnp.asarray(rng.standard_normal((BT, 56, 56, 96)), dtype)
        x56w = jnp.asarray(rng.standard_normal((BT, 56, 56, 384)), dtype)
        train_bench(MBConv(features=96, dtype=dtype), x56, "mbconv full @56^2 96->384->96")
        train_bench(ConvBNAct(384, kernel=1, act=False, dtype=dtype), x56,
                    "  pw expand 1x1 96->384 +BN")
        train_bench(ConvBNAct(384, kernel=3, groups=384, act=False, dtype=dtype), x56w,
                    "  dw 3x3 384ch +BN")
        train_bench(SELayer(dtype=dtype), x56w, "  SE @384", train_kw=None)
        train_bench(ConvBNAct(96, kernel=1, act=False, dtype=dtype), x56w,
                    "  pw project 1x1 384->96 +BN")

    if want("matmul"):
        a = jnp.asarray(rng.standard_normal((8192, 8192)), dtype)

        def mm(a):
            return jnp.sum((a @ a).astype(jnp.float32))

        dt = bench(mm, a, tag="matmul 8192^3 (ceiling probe)")
        tf = 2 * 8192 ** 3 / (dt / 1000.0) / 1e12
        print(f"{'-> sustained matmul':42s} {tf:9.1f} TF/s")


if __name__ == "__main__":
    main()
