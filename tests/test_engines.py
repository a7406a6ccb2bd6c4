"""Training-engine smoke tests: SSL pipelines A/B/C take steps, losses are
finite, EMA updates, collapse/non-finite guards exist."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssl_vit_video_analytics_tpu.models import TemporalSSL, TinyVideoMAE, TinyViTMAE, TinyViT
from ssl_vit_video_analytics_tpu.train.mae_engine import (
    make_pixel_mae_step, make_token_mae_step, wrap_accum_and_skip)
from ssl_vit_video_analytics_tpu.train.ssl_engine import make_ssl_step, perm_table_4way
from ssl_vit_video_analytics_tpu.train.state import create_train_state, make_optimizer, update_ema


def tiny_enc():
    return TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                   num_heads=(1, 2, 2, 2), use_checkpoint=False, drop_path_rate=0.0)


def batch_of(B, T, S):
    rng = np.random.default_rng(0)
    return {"clip": rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)}


def test_pixel_mae_step():
    B, T, S = 2, 4, 32
    model = TinyVideoMAE(encoder=tiny_enc(), clip_len=T, img_size=S, patch_size=8,
                         decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2)
    L = (S // 8) ** 2
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, S, S, 3)),
                                     jnp.zeros((B, T, L), bool)))(jax.random.key(0))
    tx = wrap_accum_and_skip(make_optimizer(1e-3), accum_steps=2)
    state = create_train_state(v["params"], tx, batch_stats=v.get("batch_stats"))
    step = make_pixel_mae_step(model, tx, mask_ratio=0.75, patch_size=8)
    for i in range(2):
        state, m = step(state, batch_of(B, T, S), jax.random.key(i))
    assert np.isfinite(float(m["loss"]))
    assert "pred_std" in m and "collapse" in m


def test_token_mae_step_and_traced_ratio():
    B, T, S = 2, 3, 32
    model = TinyViTMAE(encoder=tiny_enc(), stage4_pool=2, decoder_dim=16,
                       decoder_depth=1, decoder_num_heads=2)
    P = 4
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, S, S, 3)),
                                     jnp.zeros((B, T * P), bool)))(jax.random.key(0))
    tx = make_optimizer(1e-3)
    state = create_train_state(v["params"], tx, batch_stats=v.get("batch_stats"))
    step = make_token_mae_step(model, tx, tokens_per_frame=P, mask_mode="tube")
    # two different traced ratios must NOT retrigger compilation errors
    state, m1 = step(state, batch_of(B, T, S), jax.random.key(1), jnp.float32(0.7))
    state, m2 = step(state, batch_of(B, T, S), jax.random.key(2), jnp.float32(0.9))
    for m in (m1, m2):
        assert np.isfinite(float(m["loss"]))
        assert set(m) >= {"mae_l1", "mae_l2", "pred_std", "target_std"}


def test_ssl_step_with_ema_and_top():
    B, T, S = 4, 4, 32
    model = TemporalSSL(embed_dim=16, layers=1, heads=2, clip_len=T)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, S, S, 3)),
                                     method="init_all"))(jax.random.key(0))
    tx = make_optimizer(1e-3)
    state = create_train_state(v["params"], tx, batch_stats=v.get("batch_stats"),
                               ema_params=jax.tree.map(jnp.copy, v["params"]))
    ssl_cfg = {"mask_ratio": 0.5, "mfm_weight": 1.0, "var_weight": 25.0,
               "top_weight": 1.0, "top_subsample": 0.5, "ema_momentum": 0.9}
    step = make_ssl_step(model, tx, ssl_cfg, with_top=True)
    ema_before = jax.tree.leaves(state.ema_params)[0].copy()
    state, m = step(state, batch_of(B, T, S), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert {"mfm", "var", "top"} <= set(m)
    # EMA moved toward the student
    assert not np.allclose(np.asarray(jax.tree.leaves(state.ema_params)[0]), np.asarray(ema_before))


def test_perm_table_semantics():
    t = perm_table_4way(8)
    np.testing.assert_array_equal(t[0], np.arange(8))
    np.testing.assert_array_equal(t[1], np.arange(8)[::-1])
    np.testing.assert_array_equal(t[2], [4, 5, 6, 7, 0, 1, 2, 3])
    np.testing.assert_array_equal(t[3], [2, 3, 4, 5, 6, 7, 0, 1])


def test_nonfinite_skip():
    """apply_if_finite must leave params untouched on a NaN gradient."""
    tx = wrap_accum_and_skip(make_optimizer(1e-1), accum_steps=1, skip_nonfinite=True)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    bad = {"w": jnp.full((4,), jnp.nan)}
    updates, opt_state = tx.update(bad, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.asarray(params["w"]))
