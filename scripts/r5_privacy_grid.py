"""Round-5: feature-privacy grid with attacker repeats (VERDICT r4 ask #4).

Re-runs the sigma x mask grid with attacker_repeats=3 (each repeat resamples
the perturbation AND the attacker init/order) so the reference-range segment
of fig18/fig20 carries a noise floor — the round-4 grid's sigma=0.1 > sigma=0
inversion was single-repeat attacker noise. Utility model: the XL ft_ssl best
checkpoint (0.7548 — the strongest committed model; the round-4 grid's
ft_random 4608-clip ckpt was wiped by the host reset). Split: the XL val
split (2304 clips). Reference protocol per src/run_privacy.py:309-326.

Run (chip): python scripts/r5_privacy_grid.py \
    [--ckpt path] [--split path] [--out results/privacy_r5]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt",
                   default="results/separations_xl_r4/m_ft_ssl/finetune/ft_ssl/best")
    p.add_argument("--split", default="/tmp/ssl_campaign/data_app10_xl/splits/val.txt")
    p.add_argument("--out", default="results/privacy_r5")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--classes", type=int, default=24)
    args = p.parse_args()

    from ssl_vit_video_analytics_tpu.entry import run_privacy

    if not os.path.isdir(args.ckpt):
        raise FileNotFoundError(f"utility ckpt missing: {args.ckpt}")
    cfg = {
        "seed": 42,
        "device": {"compute_dtype": "bfloat16"},
        "dataset": {"backend": "packed", "split": args.split,
                    "num_classes": args.classes, "clip_len": 16, "stride": 1,
                    "image_size": 112, "device_resident": "true"},
        "paths": {"split_root": ""},
        "model": {"embed_dim": 256, "finetune_ckpt": args.ckpt},
        "runtime": {"batch_size": 16},
        "visual_privacy": {"enabled": False},
        "feature_privacy": {"enabled": True,
                            "noise_sigmas": [0.0, 0.05, 0.1, 0.2,
                                             0.5, 1.0, 2.0, 4.0],
                            "mask_ratios": [0.0, 0.2, 0.4],
                            "attacker_epochs": 10, "attacker_lr": 1e-3,
                            "attacker_repeats": args.repeats},
        "output": {"save_dir": args.out},
    }
    run_privacy.run(cfg, log=print)


if __name__ == "__main__":
    main()
