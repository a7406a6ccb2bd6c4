"""Environment preflight report (reference: env_checker.py:114-166).

Writes python/OS/jax/TPU/package versions + device inventory to
logs/env_report.txt and stdout.

Usage: python env_checker.py
"""
from __future__ import annotations

import os
import platform
import shutil
import sys

PACKAGES = ["jax", "jaxlib", "flax", "optax", "orbax.checkpoint", "chex",
            "einops", "numpy", "yaml", "cv2", "PIL", "matplotlib", "pandas"]


def gather() -> list[str]:
    lines = []
    lines.append(f"python: {sys.version.split()[0]} ({sys.executable})")
    lines.append(f"platform: {platform.platform()}")
    lines.append(f"cpu_count: {os.cpu_count()}")
    lines.append(f"ffmpeg: {shutil.which('ffmpeg') or 'NOT FOUND'}")
    try:
        import jax
        lines.append(f"jax backend: {jax.default_backend()}")
        for d in jax.devices():
            lines.append(f"device: {d.device_kind} (id={d.id}, platform={d.platform})")
        lines.append(f"device_count: {jax.device_count()} "
                     f"local={jax.local_device_count()}")
    except Exception as e:  # pragma: no cover
        lines.append(f"jax: FAILED ({type(e).__name__}: {e})")
    for mod in PACKAGES:
        try:
            import importlib
            m = importlib.import_module(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            lines.append(f"{mod}: NOT INSTALLED")
    return lines


def main():
    lines = gather()
    report = "\n".join(lines)
    print(report)
    os.makedirs("logs", exist_ok=True)
    with open("logs/env_report.txt", "w") as f:
        f.write(report + "\n")
    print("\n[INFO] wrote logs/env_report.txt")


if __name__ == "__main__":
    main()
