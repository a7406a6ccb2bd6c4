"""Shape/grad smoke tests for all model families on tiny CPU shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.models import (
    MobileViTBackbone, TinyViT, TinyVideoMAE, TinyViTMAE, TemporalSSL,
    VideoClassifier, ClassificationHead, SSLMultiTaskHead,
)
from jitutil import jinit, japply


def small_tinyvit(**kw):
    return TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                   num_heads=(1, 2, 2, 2), use_checkpoint=False, **kw)


def test_mobilevit_shapes():
    model = MobileViTBackbone(embed_dim=32)
    x = jnp.zeros((2, 32, 32, 3))
    vars_ = jinit(model, jax.random.key(0), x)
    (feat, emb), _ = japply(model, vars_, x, train=True, mutable=["batch_stats"])
    # 32 -> 16 (stem) -> 8 (s1) -> 4 (s2) -> 4 (mvit1) -> 2 (mvit2) -> 1 (mvit3)
    assert feat.shape == (2, 1, 1, 32)
    assert emb.shape == (2, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_tinyvit_stage3_grid():
    model = small_tinyvit()
    x = jnp.zeros((2, 112, 112, 3))
    vars_ = jinit(model, jax.random.key(0), x, stage_limit=3)
    out = japply(model, vars_, x, stage_limit=3)
    assert out.shape == (2, 14, 14, 24)  # 112 -> 56 (stem) -> 56, 28, 14
    vars4 = jinit(model, jax.random.key(0), x)
    out4 = japply(model, vars4, x)
    assert out4.shape == (2, 7, 7, 32)


def test_tiny_video_mae_forward():
    enc = small_tinyvit()
    model = TinyVideoMAE(encoder=enc, clip_len=4, img_size=32, patch_size=8,
                         decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2)
    clip = jnp.zeros((2, 4, 32, 32, 3))
    L = (32 // 8) ** 2
    mask = jnp.zeros((2, 4, L), bool).at[:, :, :10].set(True)
    vars_ = jinit(model, jax.random.key(0), clip, mask)
    pred = japply(model, vars_, clip, mask)
    assert pred.shape == (2, 4 * L, 8 * 8 * 3)


def test_tinyvit_mae_forward():
    enc = small_tinyvit()
    model = TinyViTMAE(encoder=enc, stage4_pool=2, decoder_dim=16,
                       decoder_depth=1, decoder_num_heads=2)
    clip = jnp.zeros((2, 3, 32, 32, 3))
    N = 3 * 4
    mask = jnp.zeros((2, N), bool).at[:, :6].set(True)
    vars_ = jinit(model, jax.random.key(0), clip, mask)
    rec, target = japply(model, vars_, clip, mask)
    assert rec.shape == target.shape == (2, N, 32)


def test_temporal_ssl_tokens_and_predictor():
    model = TemporalSSL(embed_dim=16, layers=1, heads=2, clip_len=4)
    clip = jnp.zeros((2, 4, 32, 32, 3))
    mask = jnp.zeros((2, 4), bool).at[:, :2].set(True)
    vars_ = jinit(model, jax.random.key(0), clip, mask, method="init_all")
    ctx = japply(model, vars_, clip, mask)
    assert ctx.shape == (2, 4, 16)
    pred, _ = japply(model, vars_, ctx.reshape(-1, 16), train=True,
                     method="predictor", mutable=["batch_stats"])
    assert pred.shape == (8, 16)
    top = japply(model, vars_, ctx, method="top_logits")
    assert top.shape == (2, 4)


def test_video_classifier_and_grad():
    backbone = MobileViTBackbone(embed_dim=16)
    model = VideoClassifier(backbone=backbone, num_classes=5)
    clip = jnp.ones((2, 3, 32, 32, 3))
    vars_ = jinit(model, jax.random.key(0), clip)
    logits = japply(model, vars_, clip)
    assert logits.shape == (2, 5)

    @jax.jit
    def grad_fn(params):
        def loss_fn(p):
            out, _ = model.apply({**vars_, "params": p}, clip, train=True,
                                 mutable=["batch_stats"])
            return jnp.mean(out ** 2)
        return jax.grad(loss_fn)(params)

    g = grad_fn(vars_["params"])
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_heads():
    head = ClassificationHead(num_classes=7)
    x = jnp.zeros((2, 4, 4, 8))
    v = jinit(head, jax.random.key(0), x)
    assert japply(head, v, x).shape == (2, 7)

    mt = SSLMultiTaskHead(embed_dim=8)
    tokens = jnp.ones((2, 4, 8))
    mask = jnp.zeros((2, 4), bool).at[:, :2].set(True)
    pairs = jnp.array([[0, 1], [2, 3]])
    labels = jnp.array([0, 1])
    v = jinit(mt, jax.random.key(0), tokens, tokens, mask, pairs, labels)
    out = japply(mt, v, tokens, tokens * 2, mask, pairs, labels)
    assert set(out) == {"loss", "mfm", "order"}


def test_stem_conv_s2d_matches_dense_conv():
    """StemConvS2D (space-to-depth 2x2/K=4C rewrite) == nn.Conv 3x3/s2/SAME
    on the same [3,3,C,F] kernel: forward and input/weight grads."""
    import numpy as np
    from flax import linen as nn

    from ssl_vit_video_analytics_tpu.models.layers import StemConvS2D

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 3)), jnp.float32)
    mod = StemConvS2D(8)
    v = mod.init(jax.random.key(0), x)
    w = v["params"]["kernel"]
    assert w.shape == (3, 3, 3, 8)

    ref = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                  use_bias=False)
    out = mod.apply(v, x)
    ref_out = ref.apply({"params": {"kernel": w}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)

    def loss(apply_fn):
        def inner(params, x):
            return jnp.sum(jnp.sin(apply_fn(params, x)))
        return inner

    gm = jax.grad(loss(lambda p, x: mod.apply({"params": p}, x)),
                  argnums=(0, 1))(v["params"], x)
    gr = jax.grad(loss(lambda p, x: ref.apply({"params": p}, x)),
                  argnums=(0, 1))({"kernel": w}, x)
    np.testing.assert_allclose(np.asarray(gm[0]["kernel"]),
                               np.asarray(gr[0]["kernel"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gm[1]), np.asarray(gr[1]), atol=1e-5)


def test_tinyvit_not_dead_at_init():
    """Regression: the reference zero-inits the final MBConv BN scale even on
    NON-residual (stride-2 downsample) blocks (ref: src/models/tiny_vit.py:49,
    :152), which makes the block output exactly 0 and deadlocks gradients —
    the encoder stays input-independent forever (verified on a 60-epoch MAE
    checkpoint: all four zero-init scales still bit-exact 0.0). We zero-init
    only residual branches; this pins (a) input-dependent features at init,
    (b) gradient actually reaching the stem through all downsample blocks."""
    model = small_tinyvit()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 112, 112, 3)), jnp.float32)
    vars_ = jinit(model, jax.random.key(0), x, stage_limit=3)

    out = japply(model, vars_, x, stage_limit=3)
    emb = np.asarray(out).reshape(3, -1)
    # cross-input variation at init (dead network gives bit-identical rows)
    assert np.abs(emb - emb.mean(axis=0)).max() > 1e-6

    def loss(params):
        y = model.apply({"params": params, "batch_stats": vars_["batch_stats"]},
                        x, train=True, mutable=["batch_stats"],
                        rngs={"dropout": jax.random.key(1)},
                        stage_limit=3)[0]
        return jnp.sum(y * y)

    grads = jax.jit(jax.grad(loss))(vars_["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(p) for p, g in flat
            if float(jnp.abs(g).max()) == 0.0]
    # stem + every stage's downsample must receive gradient; residual-branch
    # zero-init scales legitimately give SOME zero grads elsewhere at init
    assert not any("patch_embed" in p or "/down/" in p for p in dead), dead
