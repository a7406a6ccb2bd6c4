"""Pipeline-parallel executor (parallel/pp.py): equivalence to the
sequential TransformerEncoder stack, forward and backward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_vit_video_analytics_tpu.models.layers import (
    TransformerBlock, TransformerEncoder)
from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh
from ssl_vit_video_analytics_tpu.parallel.pp import (
    pipeline_apply, pipeline_transformer_encoder, stack_block_params,
    unstack_block_params)

B, L, D, HEADS = 8, 12, 16, 2


def _setup(depth):
    enc = TransformerEncoder(depth, HEADS, mlp_ratio=2.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, D)),
                    jnp.float32)
    params = enc.init(jax.random.key(0), x)["params"]
    block = TransformerBlock(HEADS, mlp_ratio=2.0)
    return enc, block, params, x


def test_stack_unstack_roundtrip():
    _, _, params, _ = _setup(4)
    stacked = stack_block_params(params, 4)
    back = unstack_block_params(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, back)


@pytest.mark.parametrize("depth,n_stages,n_micro", [
    (4, 4, 4),   # one block per stage
    (8, 4, 2),   # two blocks per stage
    (4, 2, 8),   # deep microbatching
    (4, 4, 1),   # single microbatch (pure model sharding, full bubble)
])
def test_pipeline_forward_matches_sequential(depth, n_stages, n_micro):
    enc, block, params, x = _setup(depth)
    mesh = make_mesh({"pipe": n_stages})
    ref = enc.apply({"params": params}, x, True)
    out = pipeline_transformer_encoder(block, params, x, n_micro, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential():
    depth, n_stages, n_micro = 4, 4, 4
    enc, block, params, x = _setup(depth)
    mesh = make_mesh({"pipe": n_stages})

    def loss_seq(p, xx):
        return jnp.sum(enc.apply({"params": p}, xx, True) ** 2)

    def loss_pp(p, xx):
        return jnp.sum(
            pipeline_transformer_encoder(block, p, xx, n_micro, mesh) ** 2)

    l_seq, g_seq = jax.value_and_grad(loss_seq, argnums=(0, 1))(params, x)
    l_pp, g_pp = jax.value_and_grad(loss_pp, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
        g_pp, g_seq)


def test_pipeline_apply_rejects_bad_shapes():
    _, block, params, x = _setup(4)
    mesh = make_mesh({"pipe": 4})
    stacked = stack_block_params(params, 4)

    def block_fn(p, a):
        return block.apply({"params": p}, a, True)

    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(block_fn, stacked, x, 3, mesh)  # B=8 % 3
    stacked6 = jax.tree.map(lambda a: jnp.concatenate(
        [a, a[:2]]), stacked)  # depth 6 % 4 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(block_fn, stacked6, x, 4, mesh)


def test_pixel_mae_step_pp_matches_plain():
    """Full pipeline-B train step with the pipelined decoder == plain step."""
    from ssl_vit_video_analytics_tpu.models import TinyVideoMAE, TinyViT
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import (
        create_train_state, make_optimizer)

    Bc, T, S = 8, 2, 32
    enc = TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 2, 2), use_checkpoint=False)
    model = TinyVideoMAE(encoder=enc, clip_len=T, img_size=S, patch_size=8,
                         decoder_embed_dim=16, decoder_depth=4,
                         decoder_num_heads=2)
    Lp = (S // 8) ** 2
    clip0 = jnp.zeros((Bc, T, S, S, 3), jnp.float32)
    mask0 = jnp.zeros((Bc, T, Lp), bool)
    variables = model.init(jax.random.key(0), clip0, mask0)
    batch = {"clip": np.random.default_rng(1).integers(
        0, 255, (Bc, T, S, S, 3)).astype(np.uint8)}
    rng = jax.random.key(7)
    mesh = make_mesh({"pipe": 4})

    import optax

    results = {}
    for tag, kw in (("plain", {}),
                    ("pp", {"pp_mesh": mesh, "pp_microbatches": 4})):
        # SGD, not adam: after one adam step noise-dominated grads produce
        # ~lr*sign(g) updates, so reduction-order noise flips signs. With SGD
        # the param delta IS the grad — comparing params compares grads.
        tx = optax.sgd(1e-3)
        state = create_train_state(
            jax.tree.map(jnp.copy, variables["params"]), tx,
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]))
        step = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8, **kw)
        new_state, metrics = step(state, batch, rng)
        results[tag] = (float(metrics["loss"]), new_state.params)

    assert np.isfinite(results["pp"][0])
    np.testing.assert_allclose(results["pp"][0], results["plain"][0], rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6),
        results["pp"][1], results["plain"][1])
