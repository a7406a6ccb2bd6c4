"""Pipeline-B (MAE) encoder -> finetune transfer path (VERDICT r3 #1).

The reference finetune only consumes pipeline-A MobileViT checkpoints
(ref: src/train_finetune.py:43-63); its flagship MAE pretrain feeds nothing
downstream. This framework adds a TinyViT backbone option so the pipeline-B
encoder-only checkpoint ({"params": {"encoder": ...}}, the
entry/train_ssl_mae.py save path) transfers into the classifier.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model as build_mae
from ssl_vit_video_analytics_tpu.train import finetune_engine as eng

TINY_DIMS = [8, 16, 24, 32]


def tiny_mae_cfg():
    return {
        "dataset": {"clip_len": 4, "image_size": 32},
        "model": {"embed_dims": TINY_DIMS, "decoder_embed_dim": 16,
                  "decoder_depth": 1, "decoder_num_heads": 2,
                  "use_checkpoint": False},
    }


def make_encoder_ckpt():
    """Init a tiny pipeline-B model and return its encoder-only blob, exactly
    the shape entry/train_ssl_mae.py saves."""
    model = build_mae(tiny_mae_cfg(), jnp.float32)
    B, T, S = 2, 4, 32
    L = (S // 8) ** 2
    variables = model.init(jax.random.key(1), jnp.zeros((B, T, S, S, 3)),
                           jnp.zeros((B, T, L), bool))
    return {
        "params": {"encoder": variables["params"]["encoder"]},
        "batch_stats": {"encoder": variables["batch_stats"]["encoder"]},
    }


def build_classifier():
    model = eng.build_model(4, 24, backbone="tinyvit",
                            backbone_kwargs={"embed_dims": TINY_DIMS})
    variables = eng.init_model(model, jax.random.key(0), (2, 4, 32, 32, 3))
    return model, variables


def test_pipeline_b_ckpt_loads_into_tinyvit_backbone():
    blob = make_encoder_ckpt()
    model, variables = build_classifier()

    loaded = eng.load_pretrained_ssl(variables, blob)
    for col in ("params", "batch_stats"):
        src = jax.tree.leaves(blob[col]["encoder"])
        dst = jax.tree.leaves(loaded[col]["backbone"]["encoder"])
        assert len(src) == len(dst) > 0
        for s, d in zip(src, dst):
            np.testing.assert_array_equal(np.asarray(s, np.float32),
                                          np.asarray(d, np.float32))
    # it actually changed the random init
    init_leaves = jax.tree.leaves(variables["params"]["backbone"])
    new_leaves = jax.tree.leaves(loaded["params"]["backbone"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(init_leaves, new_leaves))
    # head untouched
    for a, b in zip(jax.tree.leaves(variables["params"]["head"]),
                    jax.tree.leaves(loaded["params"]["head"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the loaded classifier runs end to end
    logits = model.apply({"params": loaded["params"],
                          "batch_stats": loaded["batch_stats"]},
                         jnp.zeros((2, 4, 32, 32, 3)), train=False)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_tinyvit_backbone_freeze_gates_updates():
    """linear_probe on the TinyViT backbone must zero backbone updates while
    the head still moves (the freeze predicate keys on 'backbone' regardless
    of backbone family)."""
    import optax

    _, variables = build_classifier()
    params = variables["params"]
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    cfg = {"learning_rate": 1e-3, "weight_decay": 0.0}
    tx = eng.build_finetune_tx(cfg, "linear_probe", params, freeze_backbone=True)
    updates, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)

    for a, b in zip(jax.tree.leaves(params["backbone"]),
                    jax.tree.leaves(new_params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    head_delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              params["head"], new_params["head"])
    assert max(jax.tree.leaves(head_delta)) > 0.0


def test_mismatched_ckpt_raises():
    """A pipeline-B encoder with different dims must fail loudly, not load
    garbage silently."""
    import pytest

    blob = make_encoder_ckpt()
    model = eng.build_model(4, 24, backbone="tinyvit",
                            backbone_kwargs={"embed_dims": [8, 16, 32, 40]})
    variables = eng.init_model(model, jax.random.key(0), (2, 4, 32, 32, 3))
    with pytest.raises(ValueError, match="not match"):
        eng.load_pretrained_ssl(variables, blob)
