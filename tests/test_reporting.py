"""Reporting: every figure renders from synthetic CSVs; joint Pareto writes
the summary CSV."""
import os

from ssl_vit_video_analytics_tpu.reporting import plotting as rp
from ssl_vit_video_analytics_tpu.utils.io import write_csv, read_csv_dicts


def _write_inputs(d):
    write_csv(os.path.join(d, "early.csv"), [
        {"threshold": "0.55", "top1": "0.66", "top5": "0.88", "avg_frames": "7.9",
         "avg_conf": "0.71", "avg_latency_ms": "53.8", "throughput_fps": "1174.9"},
        {"threshold": "0.75", "top1": "0.67", "top5": "0.89", "avg_frames": "10.5",
         "avg_conf": "0.80", "avg_latency_ms": "57.6", "throughput_fps": "1458.3"},
    ])
    write_csv(os.path.join(d, "gating.csv"), [
        {"k": "4", "top1": "0.63", "top5": "0.86",
         "avg_latency_ms": "12.7", "throughput_clips_per_s": "629.9"},
        {"k": "16", "top1": "0.67", "top5": "0.89",
         "avg_latency_ms": "48.7", "throughput_clips_per_s": "164.3"},
    ])
    write_csv(os.path.join(d, "feature.csv"), [
        {"sigma": "0.0", "mask_ratio": "0.0", "top1": "0.67", "top5": "0.89",
         "entropy": "1.2", "attacker_top1": "0.55", "per_vs_clean": "0.82"},
        {"sigma": "0.2", "mask_ratio": "0.4", "top1": "0.41", "top5": "0.70",
         "entropy": "2.2", "attacker_top1": "0.21", "per_vs_clean": "0.31"},
    ])
    write_csv(os.path.join(d, "fed.csv"), [
        {"round": "1", "val_top1": "0.31", "val_top5": "0.62", "avg_local_loss": "2.1",
         "clients": "5", "model_mb": "10.4", "comm_mb_round": "104.3",
         "comm_mb_total": "104.3"},
        {"round": "2", "val_top1": "0.45", "val_top5": "0.74", "avg_local_loss": "1.6",
         "clients": "5", "model_mb": "10.4", "comm_mb_round": "104.3",
         "comm_mb_total": "208.7"},
    ])


def test_generate_all(tmp_path):
    d = str(tmp_path)
    _write_inputs(d)
    cfg = {
        "inputs": {
            "dynamic_early_exit_csv": os.path.join(d, "early.csv"),
            "dynamic_frame_gating_csv": os.path.join(d, "gating.csv"),
            "privacy_feature_csv": os.path.join(d, "feature.csv"),
            "federated_csv": os.path.join(d, "fed.csv"),
        },
        "outputs": {"figures_dir": os.path.join(d, "figs"),
                    "summary_csv": os.path.join(d, "summary.csv")},
        "figures": {},
        "joint_score": {"weights": {"w_latency": 0.45, "w_comm": 0.35,
                                    "w_privacy": 0.2}},
    }
    made = rp.generate_all(cfg, log=lambda *_: None)
    names = {os.path.basename(p) for p in made}
    assert {"fig17_dynamic_tradeoff.png", "fig18_feature_privacy.png",
            "fig19_federated.png", "fig20_joint_pareto.png"} <= names
    rows = read_csv_dicts(os.path.join(d, "summary.csv"))
    assert set(rows[0]) == {"threshold", "top1", "latency_ms", "comm_mb_round",
                            "joint_cost"}
