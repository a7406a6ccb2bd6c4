"""Figure-generation CLI (reference: src/plotting.py, but CSV-driven).

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.plotting --config configs/plotting.yaml
"""
from __future__ import annotations

from ..reporting.plotting import generate_all
from ..utils.config import load_yaml
from . import common


def main():
    p = common.make_parser("CSV-driven paper figures")
    args = p.parse_args()
    cfg = load_yaml(args.config or "configs/plotting.yaml")
    from ..utils.config import apply_overrides
    apply_overrides(cfg, args.overrides)
    generate_all(cfg)


if __name__ == "__main__":
    main()
