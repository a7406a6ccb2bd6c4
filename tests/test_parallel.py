"""Parallelism correctness: data-parallel step equals single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ssl_vit_video_analytics_tpu.models import MobileViTBackbone, VideoClassifier
from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh, shard_batch
from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
from ssl_vit_video_analytics_tpu.train.state import create_train_state


def test_dp_step_matches_single_device():
    B, T, S = 8, 2, 32
    model = eng.build_model(4, 16)
    variables = eng.init_model(model, jax.random.key(0), (B, T, S, S, 3))
    tr_cfg = {"learning_rate": 1e-3, "weight_decay": 0.01, "grad_clip": 1.0}
    rng = np.random.default_rng(0)
    batch = {"clip": rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8),
             "label": rng.integers(0, 4, (B,), dtype=np.int32)}

    def one_step(shard):
        # train steps donate the state buffers — give each run its own copy
        v = jax.tree.map(jnp.array, variables)
        tx = eng.build_finetune_tx(tr_cfg, "ft_random", v["params"], False)
        state = create_train_state(v["params"], tx,
                                   batch_stats=v.get("batch_stats"))
        step = eng.make_train_step(model, tx)
        if shard:
            mesh = make_mesh({"data": jax.device_count()})
            state = jax.device_put(state, NamedSharding(mesh, P()))
            b = shard_batch(batch, mesh)
        else:
            b = jax.tree.map(jnp.asarray, batch)
        new_state, metrics = step(state, b)
        return jax.device_get(new_state.params), float(metrics["loss"])

    p_single, loss_single = one_step(shard=False)
    p_dp, loss_dp = one_step(shard=True)
    assert abs(loss_single - loss_dp) < 1e-5
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)  # cross-device reduction order


def test_tp_step_matches_replicated():
    """TP-sharded decoder params must produce the same loss as replicated."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ssl_vit_video_analytics_tpu.models import TinyViT, TinyVideoMAE
    from ssl_vit_video_analytics_tpu.parallel.tp import shard_params_tp, count_sharded
    from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state, make_optimizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    enc = TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 2, 2), use_checkpoint=False, drop_path_rate=0.0)
    model = TinyVideoMAE(encoder=enc, clip_len=2, img_size=32, patch_size=8,
                         decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2)
    B, T, S, L = 4, 2, 32, 16
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, S, S, 3)),
                                     jnp.zeros((B, T, L), bool)))(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {"clip": rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)}

    def run(shard_tp):
        vv = jax.tree.map(jnp.array, v)
        tx = make_optimizer(1e-3)
        params = vv["params"]
        bs = vv["batch_stats"]
        if shard_tp:
            mesh = make_mesh({"data": 2, "model": jax.device_count() // 2})
            n_sh, _ = count_sharded(params, mesh)
            assert n_sh > 0, "no params matched the TP rules"
            params = shard_params_tp(params, mesh)
            bs = jax.device_put(bs, NamedSharding(mesh, P()))
            b = {"clip": jax.device_put(batch["clip"], NamedSharding(mesh, P("data")))}
        else:
            b = {"clip": jnp.asarray(batch["clip"])}
        state = create_train_state(params, tx, batch_stats=bs)
        step = make_pixel_mae_step(model, tx, mask_ratio=0.75, patch_size=8)
        _, m = step(state, b, jax.random.key(7))
        return float(m["loss"])

    l_repl = run(False)
    l_tp = run(True)
    assert abs(l_repl - l_tp) < 1e-4


def test_dp_ssl_step_matches_single_device():
    """Pipeline A under dp: EMA teacher update + BN batch_stats + TOP branch
    all agree with the single-device step (VERDICT r2 #4)."""
    from ssl_vit_video_analytics_tpu.models import TemporalSSL
    from ssl_vit_video_analytics_tpu.train.ssl_engine import make_ssl_step
    from ssl_vit_video_analytics_tpu.train.state import make_optimizer

    B, T, S = 8, 4, 32
    model = TemporalSSL(embed_dim=16, layers=1, heads=2, clip_len=T)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((B, T, S, S, 3)), method="init_all"))(jax.random.key(0))
    ssl_cfg = {"mask_ratio": 0.5, "mfm_weight": 1.0, "var_weight": 1.0,
               "top_weight": 1.0, "top_subsample": 1.0, "ema_momentum": 0.99}
    rng = np.random.default_rng(1)
    batch = {"clip": rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)}

    def run(shard):
        v = jax.tree.map(jnp.array, variables)
        tx = make_optimizer(1e-3)
        state = create_train_state(
            v["params"], tx, batch_stats=v.get("batch_stats"),
            ema_params=jax.tree.map(jnp.copy, v["params"]))
        if shard:
            mesh = make_mesh({"data": jax.device_count()})
            state = jax.device_put(state, NamedSharding(mesh, P()))
            b = {"clip": jax.device_put(batch["clip"],
                                        NamedSharding(mesh, P("data")))}
        else:
            b = {"clip": jnp.asarray(batch["clip"])}
        step = make_ssl_step(model, tx, ssl_cfg, with_top=True)
        new_state, metrics = step(state, b, jax.random.key(3))
        return (jax.device_get(new_state.ema_params), float(metrics["loss"]),
                float(metrics["top"]))

    ema_s, loss_s, top_s = run(False)
    ema_d, loss_d, top_d = run(True)
    assert abs(loss_s - loss_d) < 1e-4 and abs(top_s - top_d) < 1e-4
    for a, b in zip(jax.tree.leaves(ema_s), jax.tree.leaves(ema_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_dp_token_mae_step_matches_single_device():
    """Pipeline C under dp (VERDICT r2 #4)."""
    from ssl_vit_video_analytics_tpu.models import TinyViT, TinyViTMAE
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_token_mae_step
    from ssl_vit_video_analytics_tpu.train.state import make_optimizer

    enc = TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 2, 2), use_checkpoint=False,
                  drop_path_rate=0.0)
    model = TinyViTMAE(encoder=enc, stage4_pool=2, decoder_dim=16,
                       decoder_depth=1, decoder_num_heads=2)
    B, T, S, Ptok = 8, 2, 32, 4
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, S, S, 3)),
                                     jnp.zeros((B, T * Ptok), bool)))(jax.random.key(0))
    rng = np.random.default_rng(2)
    batch = {"clip": rng.integers(0, 255, (B, T, S, S, 3), dtype=np.uint8)}

    def run(shard):
        vv = jax.tree.map(jnp.array, v)
        tx = make_optimizer(1e-3)
        state = create_train_state(vv["params"], tx,
                                   batch_stats=vv.get("batch_stats"))
        if shard:
            mesh = make_mesh({"data": jax.device_count()})
            state = jax.device_put(state, NamedSharding(mesh, P()))
            b = {"clip": jax.device_put(batch["clip"],
                                        NamedSharding(mesh, P("data")))}
        else:
            b = {"clip": jnp.asarray(batch["clip"])}
        step = make_token_mae_step(model, tx, tokens_per_frame=Ptok,
                                   mask_mode="tube")
        new_state, m = step(state, b, jax.random.key(5), jnp.float32(0.75))
        return jax.device_get(new_state.params), float(m["loss"])

    p_s, loss_s = run(False)
    p_d, loss_d = run(True)
    assert abs(loss_s - loss_d) < 1e-4
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_sequence_parallel_attention_matches_single_device():
    """sp_attention_packed (queries sharded over the seq axis, K/V
    all-gathered) == single-device packed flash attention, forward and
    dQ — the all_gather VJP reduce-scatter path included."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssl_vit_video_analytics_tpu.ops.flash_attention import (
        flash_attention_packed)
    from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh
    from ssl_vit_video_analytics_tpu.parallel.sp import sp_attention_packed

    mesh = make_mesh({"seq": 8})
    rng = np.random.default_rng(0)
    B, L, H, d = 2, 512, 4, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, H * d)), jnp.float32)
               for _ in range(3))
    ref = flash_attention_packed(q, k, v, H)
    out = sp_attention_packed(q, k, v, H, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g = jax.grad(lambda q: jnp.sum(jnp.sin(
        sp_attention_packed(q, k, v, H, mesh))))(q)
    gr = jax.grad(lambda q: jnp.sum(jnp.sin(
        flash_attention_packed(q, k, v, H))))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               atol=5e-5, rtol=5e-5)
