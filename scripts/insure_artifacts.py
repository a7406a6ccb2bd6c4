"""Reset-insurance: snapshot in-flight campaign artifacts into the git tree.

The host VM can reset between sessions, wiping /tmp and gitignored dirs
(results/, checkpoints/) — round 4 lost a 2-hour XL campaign that way
(docs/ROUND4_NOTES.md). This copies the small, high-value artifacts of any
in-flight queue (metric CSVs, campaign summaries, checkpoint manifests, log
tails) from results/ into docs/examples/insurance/, where a pathspec-scoped
commit makes them reset-survivable at epoch granularity instead of
campaign granularity.

Used by scripts/insurance_watch.sh; safe to run at any time (pure copy).
"""
from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "results")
DST = os.path.join(REPO, "docs", "examples", "insurance")

# (suffix match, max bytes) — only small evidence files, never checkpoints.
PATTERNS = [
    ("metrics.csv", 2_000_000),
    ("ssl_metrics.csv", 2_000_000),
    ("campaign_summary.json", 100_000),
    (".meta.json", 100_000),
    ("_results.csv", 2_000_000),
    ("evaluate.csv", 2_000_000),
    ("feature_privacy.csv", 2_000_000),
]


def main() -> int:
    if not os.path.isdir(SRC):
        return 0
    copied = 0
    for root, _dirs, files in os.walk(SRC):
        for name in files:
            path = os.path.join(root, name)
            for suffix, max_bytes in PATTERNS:
                if name.endswith(suffix) and os.path.getsize(path) <= max_bytes:
                    rel = os.path.relpath(path, SRC).replace(os.sep, "__")
                    dst = os.path.join(DST, rel)
                    os.makedirs(DST, exist_ok=True)
                    if (not os.path.exists(dst)
                            or os.path.getmtime(path) > os.path.getmtime(dst)
                            or os.path.getsize(path) != os.path.getsize(dst)):
                        shutil.copy2(path, dst)
                        copied += 1
                    break
    # Log tails: the last 40 lines of each queue log, enough to resume triage.
    for name in sorted(os.listdir(SRC)):
        if name.endswith(".log"):
            path = os.path.join(SRC, name)
            try:
                with open(path, "rb") as f:
                    f.seek(max(0, os.path.getsize(path) - 8192))
                    tail = f.read().decode("utf-8", "replace").splitlines()[-40:]
            except OSError:
                continue
            os.makedirs(DST, exist_ok=True)
            dst = os.path.join(DST, name + ".tail")
            text = "\n".join(tail) + "\n"
            prev = open(dst).read() if os.path.exists(dst) else None
            if prev != text:
                with open(dst, "w") as f:
                    f.write(text)
                copied += 1
    print(f"[insure] {copied} artifact(s) refreshed under {os.path.relpath(DST, REPO)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
