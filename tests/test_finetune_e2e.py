"""End-to-end finetune: two_stage mode on synthetic data, loss must drop and
the model must beat chance on the training classes."""
import os

from ssl_vit_video_analytics_tpu.entry import train_finetune
from ssl_vit_video_analytics_tpu.utils.config import merge_configs, load_yaml


def tiny_cfg(synth_data, tmp_path, mode="two_stage"):
    return {
        "seed": 42,
        "device": {"compute_dtype": "float32"},
        "dataset": {
            "backend": "packed", "clip_len": 4, "stride": 2, "image_size": 32,
            "train_split": synth_data["train"], "val_split": synth_data["val"],
            "num_classes": 4,
        },
        "training": {
            "epochs": 2, "batch_size": 4, "learning_rate": 1e-3,
            "weight_decay": 0.01, "grad_clip": 1.0, "log_interval": 100,
            "stage1_epochs": 1, "head_lr": 1e-3, "backbone_lr": 1e-4,
        },
        "model": {"embed_dim": 32, "pretrained_ssl": None},
        "evaluation": {"topk": [1]},
        "paths": {"save_dir": str(tmp_path / "ft"), "split_root": "",
                  "log_dir": str(tmp_path / "logs")},
        "experiment": {"mode": mode},
    }


def test_two_stage_finetune(synth_data, tmp_path):
    logs = []
    out = train_finetune.run(tiny_cfg(synth_data, tmp_path), log=logs.append)
    assert out["best_ckpt"] is not None and os.path.exists(out["best_ckpt"])
    assert any("unfreeze backbone" in l for l in logs)
    assert 0.0 <= out["best_top1"] <= 1.0
    # best checkpoint name is metric-encoded like the reference
    assert "finetune_epoch_" in out["best_ckpt"] and "_top1_" in out["best_ckpt"]


def test_two_stage_freeze_gates_backbone_updates():
    """The stage-1/stage-2 optimizers must actually gate backbone updates:
    frozen -> zero backbone delta, unfrozen -> nonzero. Loss-goes-down
    assertions alone can't see a silently frozen subtree (the round-3
    lesson, tests/test_pipeline_b_learns.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng

    model = eng.build_model(4, 32)
    variables = eng.init_model(model, jax.random.key(0), (2, 4, 32, 32, 3))
    params = variables["params"]
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    cfg = {"learning_rate": 1e-3, "head_lr": 1e-3, "backbone_lr": 1e-4,
           "weight_decay": 0.0}

    def step(freeze):
        tx = eng.build_finetune_tx(cfg, "two_stage", params, freeze)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)

    frozen = step(True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(frozen["backbone"])[0]),
        np.asarray(jax.tree.leaves(params["backbone"])[0]))
    assert not np.array_equal(
        np.asarray(jax.tree.leaves(frozen["head"])[0]),
        np.asarray(jax.tree.leaves(params["head"])[0]))

    unfrozen = step(False)
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          unfrozen["backbone"], params["backbone"])
    assert max(jax.tree.leaves(deltas)) > 0.0


def test_ssl_to_finetune_interop(synth_data, tmp_path):
    """Cross-entry path: pipeline-A SSL pretrain -> ft_ssl finetune loads the
    encoder into the classifier backbone (ref: src/train_finetune.py:43-63
    remaps encoder.* keys onto the backbone)."""
    import glob

    import jax
    import numpy as np

    from ssl_vit_video_analytics_tpu.entry import train_ssl
    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
    from ssl_vit_video_analytics_tpu.utils.checkpoint import restore_checkpoint

    ssl_cfg = {
        "seed": 7,
        "device": {"compute_dtype": "float32", "data_parallel": False},
        "dataset": {"backend": "packed", "train_split": synth_data["train"],
                    "clip_len": 4, "stride": 2, "image_size": 32},
        "paths": {"log_dir": str(tmp_path / "logs"), "split_root": ""},
        "model": {"embed_dim": 32, "temporal_layers": 1, "temporal_heads": 2},
        "training": {"epochs": 1, "batch_size": 4, "learning_rate": 1e-3,
                     "weight_decay": 0.05, "save_every": 1,
                     "save_dir": str(tmp_path / "ssl_a"), "clip_grad_norm": 1.0,
                     "log_interval": 100, "scheduler": {"enable": False}},
        "ssl_objectives": {"mask_ratio": 0.75, "mfm_weight": 1.0,
                           "ema_momentum": 0.99, "var_weight": 25.0,
                           "top_weight": 1.0, "top_start_epoch": 1,
                           "top_every": 2, "top_subsample": 0.5},
    }
    out = train_ssl.run(ssl_cfg, log=lambda *_: None, max_steps=2)
    ckpts = sorted(glob.glob(os.path.join(out["save_dir"], "ssl_epoch_*")))
    ckpts = [c for c in ckpts if not c.endswith(".meta.json")]
    assert ckpts, "SSL pretrain produced no periodic checkpoint"

    ft_cfg = tiny_cfg(synth_data, tmp_path, mode="ft_ssl")
    ft_cfg["model"]["pretrained_ssl"] = ckpts[-1]
    logs = []
    ft_out = train_finetune.run(ft_cfg, log=logs.append)
    assert any("Loaded SSL pretrain" in l for l in logs), logs[:5]
    assert ft_out["best_ckpt"] is not None

    # the remap really copied the encoder: backbone == ssl encoder leaf-for-leaf
    ssl_vars = restore_checkpoint(ckpts[-1])
    model = eng.build_model(4, 32)
    variables = eng.init_model(model, jax.random.key(0), (2, 4, 32, 32, 3))
    loaded = eng.load_pretrained_ssl(variables, ssl_vars)
    src_leaves = jax.tree.leaves(ssl_vars["params"]["encoder"])
    dst_leaves = jax.tree.leaves(loaded["params"]["backbone"])
    assert len(src_leaves) == len(dst_leaves)
    for s, d in zip(src_leaves, dst_leaves):
        np.testing.assert_array_equal(np.asarray(s, np.float32), np.asarray(d, np.float32))
    # and it actually changed the random init
    init_leaves = jax.tree.leaves(variables["params"]["backbone"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(init_leaves, dst_leaves))


def test_missing_ssl_ckpt_path_hard_fails(synth_data, tmp_path):
    """A non-ft_random mode given a pretrained_ssl path that does NOT exist must
    raise, not silently degrade to random init — otherwise campaign queues can
    commit random-init results as SSL-transfer evidence (ADVICE round 4)."""
    import pytest

    cfg = tiny_cfg(synth_data, tmp_path, mode="ft_ssl")
    cfg["model"]["pretrained_ssl"] = str(tmp_path / "no_such_ckpt")
    with pytest.raises(FileNotFoundError, match="pretrained_ssl"):
        train_finetune.run(cfg, log=lambda *_: None)
