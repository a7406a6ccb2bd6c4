"""CSV output schema parity with the reference.

The reference's CSVs are the comparison artifacts (SURVEY.md §5.5 requires
bit-compatible headers); these tests freeze the header strings.
"""
from ssl_vit_video_analytics_tpu.entry import run_dynamic, run_privacy, run_federated


def test_dynamic_headers():
    assert run_dynamic.EARLY_EXIT_FIELDS == (
        "threshold", "top1", "top5", "avg_frames", "avg_conf", "avg_latency_ms")
    assert run_dynamic.FRAME_GATING_FIELDS == (
        "topk", "score", "top1", "top5", "avg_latency_ms")
    assert run_dynamic.HYBRID_FIELDS == (
        "topk", "threshold", "top1", "top5", "avg_frames", "avg_latency_ms")


def test_privacy_headers():
    assert run_privacy.VISUAL_FIELDS == (
        "frame_root", "total_frames", "frames_with_face_before",
        "frames_with_face_after", "avg_faces_before", "avg_faces_after",
        "face_frame_rate_before", "face_frame_rate_after",
        "flr_conditional", "per_relative", "seconds", "overwrite_saved_root")
    assert run_privacy.FEATURE_FIELDS == (
        "sigma", "mask_ratio", "top1", "top5", "entropy",
        "attacker_top1", "per_vs_clean")


def test_federated_headers():
    assert run_federated.FED_SUMMARY_FIELDS == (
        "round", "val_top1", "val_top5", "avg_local_loss", "clients",
        "model_mb", "comm_mb_round", "comm_mb_total")
    assert run_federated.CENTRALIZED_FIELDS == ("epoch", "train_loss", "val_top1", "val_top5")
    assert run_federated.SYSTEM_PRIVACY_FIELDS == (
        "raw_upload_mb_est", "fed_comm_total_mb", "reduction_ratio")
