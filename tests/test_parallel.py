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
