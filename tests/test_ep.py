"""MoE decoder MLP + expert parallelism (models/layers.MoeMlp,
parallel/ep.py): routing math vs a per-token reference, EP-sharded vs vmap
equality, capacity-drop semantics, and the full MoE train step."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.models.layers import MoeMlp, TransformerBlock
from ssl_vit_video_analytics_tpu.parallel.ep import set_ep_mesh
from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh

B, L, D, H, E = 2, 24, 16, 32, 4


def _setup(capacity_factor=100.0):
    mlp = MoeMlp(hidden=H, num_experts=E, capacity_factor=capacity_factor)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, D)),
                    jnp.float32)
    params = mlp.init(jax.random.key(0), x)["params"]
    return mlp, params, x


def _reference(params, x):
    """Dense per-token reference: every expert on every token, then select."""
    xt = np.asarray(x).reshape(-1, D)
    logits = xt @ np.asarray(params["router"]["kernel"]) + np.asarray(
        params["router"]["bias"])
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    sel = np.asarray(jnp.argmax(probs, axis=-1))
    gate = np.asarray(jnp.max(probs, axis=-1))
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    # [E, N, D]: expert e applied to all tokens
    h = np.asarray(jax.nn.gelu(jnp.asarray(
        np.einsum("nd,edh->enh", xt, w1) + b1[:, None])))
    out_all = np.einsum("enh,ehd->end", h, w2) + b2[:, None]
    y = gate[:, None] * out_all[sel, np.arange(len(sel))]
    return y.reshape(B, L, D)


def test_moe_matches_per_token_reference():
    mlp, params, x = _setup()
    y = mlp.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), _reference(params, x),
                               rtol=2e-5, atol=2e-5)


def test_moe_ep_sharded_matches_vmap():
    mlp, params, x = _setup()
    y_vmap = mlp.apply({"params": params}, x)
    mesh = make_mesh({"expert": 4})
    set_ep_mesh(mesh)
    try:
        y_ep = mlp.apply({"params": params}, x)
    finally:
        set_ep_mesh(None)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_vmap),
                               rtol=1e-6, atol=1e-6)


def test_moe_capacity_drop_zeroes_overflow():
    """capacity_factor -> tiny: overflow tokens get MoE output exactly 0."""
    mlp, params, x = _setup(capacity_factor=0.25)  # C = ceil(48*0.25/4) = 3
    y = np.asarray(mlp.apply({"params": params}, x)).reshape(-1, D)
    ref = _reference(params, x).reshape(-1, D)
    # recompute keep mask like the module does
    xt = np.asarray(x).reshape(-1, D)
    logits = xt @ np.asarray(params["router"]["kernel"]) + np.asarray(
        params["router"]["bias"])
    sel = np.asarray(jnp.argmax(jax.nn.softmax(jnp.asarray(logits), -1), -1))
    onehot = np.eye(E)[sel]
    pos = np.cumsum(onehot, axis=0) - 1.0
    kept = ((pos < 3) * onehot).sum(-1) > 0
    assert kept.sum() < len(kept)  # some tokens actually dropped
    np.testing.assert_allclose(y[kept], ref[kept], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(y[~kept], 0.0)


def test_moe_block_grads_flow():
    blk = TransformerBlock(2, mlp_ratio=2.0, moe_experts=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, L, D)),
                    jnp.float32)
    params = blk.init(jax.random.key(1), x)["params"]

    def loss(p):
        return jnp.sum(blk.apply({"params": p}, x, True) ** 2)

    g = jax.grad(loss)(params)
    moe = g["MoeMlp_0"]
    assert float(jnp.abs(moe["router"]["kernel"]).max()) > 0
    assert float(jnp.abs(moe["w1"]).max()) > 0
    assert float(jnp.abs(moe["w2"]).max()) > 0


def test_pixel_mae_step_moe_decoder_under_ep():
    """Full pipeline-B train step with MoE decoder MLPs, experts sharded
    over an 8-way 'expert' mesh: finite loss, expert grads nonzero."""
    import optax
    from ssl_vit_video_analytics_tpu.models import TinyVideoMAE, TinyViT
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state

    T, S = 2, 32
    enc = TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 2, 2), use_checkpoint=False)
    model = TinyVideoMAE(encoder=enc, clip_len=T, img_size=S, patch_size=8,
                         decoder_embed_dim=16, decoder_depth=1,
                         decoder_num_heads=2, decoder_moe_experts=8)
    Lp = (S // 8) ** 2
    variables = model.init(jax.random.key(0),
                           jnp.zeros((4, T, S, S, 3), jnp.float32),
                           jnp.zeros((4, T, Lp), bool))
    assert "w1" in variables["params"]["decoder"]["block0"]["MoeMlp_0"]
    tx = optax.sgd(1e-3)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8)
    batch = {"clip": np.random.default_rng(2).integers(
        0, 255, (4, T, S, S, 3)).astype(np.uint8)}
    # snapshot before the step: donate_argnums deletes the state buffers,
    # which `variables` shares
    w1_old = np.asarray(variables["params"]["decoder"]["block0"]["MoeMlp_0"]["w1"])
    set_ep_mesh(make_mesh({"expert": 8}))
    try:
        new_state, metrics = step(state, batch, jax.random.key(3))
    finally:
        set_ep_mesh(None)
    assert np.isfinite(float(metrics["loss"]))
    moe_new = new_state.params["decoder"]["block0"]["MoeMlp_0"]
    assert float(jnp.abs(moe_new["w1"] - jnp.asarray(w1_old)).max()) > 0


def test_moe_grouped_routing_matches_flat_at_high_capacity():
    """group_size=S with ample capacity: identical output to flat routing
    (routing is per-token; grouping only changes capacity accounting)."""
    mlp, params, x = _setup()          # N = 48 tokens
    y_flat = mlp.apply({"params": params}, x)
    grouped = MoeMlp(hidden=H, num_experts=E, capacity_factor=100.0,
                     group_size=12)    # 4 groups of 12
    y_grp = grouped.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_grp), np.asarray(y_flat),
                               rtol=2e-5, atol=2e-5)


def test_moe_grouped_capacity_is_per_group():
    """capacity_factor=1 with groups: each group independently drops its
    overflow (slot index resets per group), and kept tokens match the
    dense reference."""
    mlp, params, x = _setup()
    grouped = MoeMlp(hidden=H, num_experts=E, capacity_factor=1.0,
                     group_size=12)    # C = ceil(12/4) = 3 per group
    y = np.asarray(grouped.apply({"params": params}, x)).reshape(-1, D)
    ref = _reference(params, x).reshape(-1, D)
    xt = np.asarray(x).reshape(-1, D)
    logits = xt @ np.asarray(params["router"]["kernel"]) + np.asarray(
        params["router"]["bias"])
    sel = np.asarray(jnp.argmax(jax.nn.softmax(jnp.asarray(logits), -1), -1))
    onehot = np.eye(E)[sel].reshape(4, 12, E)
    pos = np.cumsum(onehot, axis=1) - 1.0
    kept = (((pos < 3) * onehot).sum(-1) > 0).reshape(-1)
    assert kept.sum() < len(kept)
    np.testing.assert_allclose(y[kept], ref[kept], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(y[~kept], 0.0)


def test_moe_grouped_ep_sharded_matches_vmap():
    mlp, params, x = _setup()
    grouped = MoeMlp(hidden=H, num_experts=E, capacity_factor=2.0,
                     group_size=12)
    y_vmap = grouped.apply({"params": params}, x)
    set_ep_mesh(make_mesh({"expert": 4}))
    try:
        y_ep = grouped.apply({"params": params}, x)
    finally:
        set_ep_mesh(None)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_vmap),
                               rtol=1e-6, atol=1e-6)


def test_moe_aux_loss_balances_router():
    """The sown Switch aux (E * sum f_e P_e) is 1.0 at perfect balance and
    its gradient drives a skewed router toward balance."""
    import optax
    mlp, params, x = _setup()

    def aux_of(p):
        _, inter = mlp.apply({"params": p}, x, mutable=["intermediates"])
        return inter["intermediates"]["moe_aux_loss"][0]

    # skew the router hard toward expert 0
    skew = jax.tree.map(lambda a: a, params)
    skew["router"]["bias"] = jnp.asarray([8.0, 0.0, 0.0, 0.0], jnp.float32)
    a0 = float(aux_of(skew))
    assert a0 > 2.0  # heavily imbalanced (max is E = 4)

    tx = optax.sgd(0.5)
    opt = tx.init(skew)
    p = skew
    for _ in range(60):
        g = jax.grad(aux_of)(p)
        up, opt = tx.update(g, opt)
        p = optax.apply_updates(p, up)
    a1 = float(aux_of(p))
    assert a1 < a0 - 0.5, (a0, a1)  # aux descends toward the balanced 1.0


def test_pixel_mae_step_moe_aux_metric():
    """make_pixel_mae_step with moe_aux_weight > 0: the moe_aux metric is
    reported, finite, and within [1, E]; router gets a gradient."""
    import optax
    from ssl_vit_video_analytics_tpu.models import TinyVideoMAE, TinyViT
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import create_train_state

    T, S = 2, 32
    enc = TinyViT(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                  num_heads=(1, 2, 2, 2), use_checkpoint=False)
    model = TinyVideoMAE(encoder=enc, clip_len=T, img_size=S, patch_size=8,
                         decoder_embed_dim=16, decoder_depth=1,
                         decoder_num_heads=2, decoder_moe_experts=4)
    Lp = (S // 8) ** 2
    variables = model.init(jax.random.key(0),
                           jnp.zeros((4, T, S, S, 3), jnp.float32),
                           jnp.zeros((4, T, Lp), bool))
    tx = optax.sgd(1e-3)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8,
                               moe_aux_weight=0.01)
    batch = {"clip": np.random.default_rng(5).integers(
        0, 255, (4, T, S, S, 3)).astype(np.uint8)}
    # snapshot before the step: donate_argnums deletes the state buffers,
    # which `variables` shares
    rt_old = np.asarray(
        variables["params"]["decoder"]["block0"]["MoeMlp_0"]["router"]["kernel"])
    new_state, metrics = step(state, batch, jax.random.key(6))
    aux = float(metrics["moe_aux"])
    # aux ~= 1 at balance but not bounded below by 1 (argmax fractions can
    # anti-correlate with prob mass); 0.9 avoids seed-flaky failures
    assert np.isfinite(aux) and 0.9 <= aux <= 4.0 + 1e-6
    rt_new = new_state.params["decoder"]["block0"]["MoeMlp_0"]["router"]["kernel"]
    assert float(jnp.abs(rt_new - jnp.asarray(rt_old)).max()) > 0


def test_moe_ep_dp_2d_mesh_matches_vmap():
    """dp x ep mesh: expert bank shards over 'expert', token dim additionally
    over 'data'; output equals the plain vmap path."""
    mlp, params, x = _setup()
    y_vmap = mlp.apply({"params": params}, x)
    set_ep_mesh(make_mesh({"data": 2, "expert": 4}))
    try:
        y_2d = mlp.apply({"params": params}, x)
    finally:
        set_ep_mesh(None)
    np.testing.assert_allclose(np.asarray(y_2d), np.asarray(y_vmap),
                               rtol=1e-6, atol=1e-6)
