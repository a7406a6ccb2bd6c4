"""Full-resume equivalence: interrupted-then-resumed training must equal an
uninterrupted run bit-for-bit in params, Adam moments, and LR-schedule
position (ref tier: src/mae/utils.py:73-92 checkpoints model+optimizer+
scheduler; src/mae/train_mae.py:165-178 restores all of it).
"""
import jax
import numpy as np

from ssl_vit_video_analytics_tpu.entry import train_mae
from ssl_vit_video_analytics_tpu.utils.checkpoint import restore_checkpoint


def _cfg(synth_data, out_dir, tmp_path):
    return {
        "seed": 42,
        "device": {"compute_dtype": "float32", "data_parallel": False},
        "dataset": {"backend": "packed", "train_split": synth_data["train"],
                    "clip_len": 4, "stride": 2, "image_size": 32},
        "paths": {"log_dir": str(tmp_path / "logs"), "split_root": ""},
        "model": {"use_checkpoint": False},
        "training": {"epochs": 2, "batch_size": 4, "grad_accum": 1,
                     "clip_grad_norm": 1.0, "lr": 1e-3, "min_lr": 0.0,
                     "weight_decay": 0.05, "warmup_epochs": 1,
                     "save_every": 1, "keep_last": 3, "log_interval": 100},
        "output": {"dir": str(out_dir)},
        "mae": {"stage4_pool": 2, "mask_mode": "tube", "mask_ratio": 0.8,
                "loss": {"type": "l2", "normalize_target": True},
                "decoder": {"dim": 16, "depth": 1, "num_heads": 2,
                            "mlp_ratio": 2.0},
                "vis_every": 0},
    }


def _leaves_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    return all(np.allclose(np.asarray(x), np.asarray(y), atol=0, rtol=0)
               for x, y in zip(fa, fb))


def test_resume_equals_uninterrupted(synth_data, tmp_path):
    # Uninterrupted: 2 epochs straight.
    cfg_a = _cfg(synth_data, tmp_path / "a", tmp_path)
    train_mae.run(cfg_a, log=lambda *_: None, resume=False)

    # Interrupted: 1 epoch (stop via max_steps at the epoch boundary, after
    # the epoch-1 checkpoint), then resume for epoch 2.
    cfg_b = _cfg(synth_data, tmp_path / "b", tmp_path)
    steps_per_epoch = 2  # 8 synth train videos / batch 4
    train_mae.run(cfg_b, log=lambda *_: None, resume=False,
                  max_steps=steps_per_epoch)
    train_mae.run(cfg_b, log=lambda *_: None, resume=True)

    a = restore_checkpoint(str(tmp_path / "a" / "ckpt_epoch_2"))
    b = restore_checkpoint(str(tmp_path / "b" / "ckpt_epoch_2"))

    assert a["step"] == b["step"]
    assert _leaves_equal(a["params"], b["params"]), "params diverged after resume"
    # Adam moments AND the warmup-cosine schedule count live in opt_state;
    # equality proves the LR continued where it stopped (no warmup restart).
    assert _leaves_equal(a["opt_state"], b["opt_state"]), \
        "optimizer state (moments / schedule count) diverged after resume"


def test_legacy_checkpoint_resume_warns_but_runs(synth_data, tmp_path):
    """Checkpoints without opt_state (round-1 format) still resume."""
    import os
    import json
    cfg = _cfg(synth_data, tmp_path / "c", tmp_path)
    train_mae.run(cfg, log=lambda *_: None, resume=False,
                  max_steps=2)
    # strip the opt_state marker to simulate a legacy checkpoint
    meta_path = str(tmp_path / "c" / "ckpt_epoch_1.meta.json")
    assert os.path.exists(meta_path)
    with open(meta_path) as f:
        meta = json.load(f)
    meta.pop("has_opt_state")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    msgs = []
    out = train_mae.run(cfg, log=lambda *m: msgs.append(" ".join(map(str, m))),
                        resume=True)
    assert out["steps"] >= 4
    assert any("legacy checkpoint" in m for m in msgs)


def test_restore_numpy_fallback(tmp_path):
    """_restore_numpy (used when a checkpoint's saved device topology is
    absent, e.g. TPU-saved -> CPU-restored for offline analysis) returns the
    same values as the normal path, as host numpy arrays."""
    from ssl_vit_video_analytics_tpu.utils.checkpoint import (
        _restore_numpy, save_checkpoint)

    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                       "b": np.ones((3,), np.float32)}}
    path = save_checkpoint(str(tmp_path), "ck", tree)
    out = _restore_numpy(path)
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(out["params"]["b"], tree["params"]["b"])
    assert isinstance(out["params"]["w"], np.ndarray)
