"""Commit-ready artifacts from the queue-11/12 XL campaign (9216 train clips).

Copies per-mode finetune metrics + SSL curve into docs/examples/csv as
separations_xl_* / ssl_metrics_xl.csv, renders the XL mode-comparison
figure, and (when queue 12 has run) copies the XL dynamic-frontier CSVs.

Usage: python scripts/make_xl_artifacts.py
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssl_vit_video_analytics_tpu.reporting.plotting import fig_finetune_comparison

CAMPAIGN = "results/separations_xl_r4"
CSV_DST = "docs/examples/csv"
FIG_DST = "docs/examples/figures"
MODES = ("ft_random", "ft_ssl", "two_stage")


def main():
    os.makedirs(CSV_DST, exist_ok=True)
    os.makedirs(FIG_DST, exist_ok=True)

    ssl_csv = os.path.join(CAMPAIGN, "ssl", "ssl_metrics.csv")
    if os.path.exists(ssl_csv):
        shutil.copyfile(ssl_csv, os.path.join(CSV_DST, "ssl_metrics_xl.csv"))
        print("copied", ssl_csv)

    ft_csvs = {}
    for m in MODES:
        src = os.path.join(CAMPAIGN, f"m_{m}", "finetune", m, "metrics.csv")
        dst = os.path.join(CSV_DST, f"separations_xl_{m}_metrics.csv")
        if os.path.exists(src):
            shutil.copyfile(src, dst)
            ft_csvs[m] = dst
            print("copied", src)
        elif os.path.exists(dst):
            # cell landed in an earlier queue and survives only as the
            # committed docs CSV (the round-4 host reset wiped results/)
            ft_csvs[m] = dst
            print("using committed", dst)
        else:
            print("MISSING", src)

    if ft_csvs:
        fig = fig_finetune_comparison(
            ft_csvs, os.path.join(FIG_DST, "fig_separations_xl.png"))
        print("figure:", fig)

    for mode in ("early_exit", "frame_gating", "hybrid"):
        src = os.path.join("results/dynamic_xl_r4", f"{mode}_results.csv")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(CSV_DST, f"{mode}_xl.csv"))
            print("copied", src)
    ev = "results/evaluate_xl_r4/evaluate.csv"
    if os.path.exists(ev):
        shutil.copyfile(ev, os.path.join(CSV_DST, "evaluate_xl.csv"))
        print("copied", ev)

    # queue 13: flagship pipeline-B at XL — MAE pretrain curve + TinyViT-
    # backbone mode table (separations_xl_b_r4/m_<mode>).
    b_pre = "results/mae_xl_r4/mae_pretrain_metrics.csv"
    if os.path.exists(b_pre):
        shutil.copyfile(b_pre, os.path.join(CSV_DST, "mae_pretrain_xl_metrics.csv"))
        print("copied", b_pre)
    b_csvs = {}
    for m in MODES:
        src = os.path.join("results/separations_xl_b_r4", f"m_{m}",
                           "finetune", m, "metrics.csv")
        if os.path.exists(src):
            dst = os.path.join(CSV_DST, f"separations_xl_b_{m}_metrics.csv")
            shutil.copyfile(src, dst)
            b_csvs[m] = dst
            print("copied", src)
    if b_csvs:
        fig = fig_finetune_comparison(
            b_csvs, os.path.join(FIG_DST, "fig_separations_xl_b.png"))
        print("figure:", fig)


if __name__ == "__main__":
    main()
