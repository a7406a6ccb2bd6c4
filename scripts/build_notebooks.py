"""Regenerate the analysis notebooks from the committed evidence CSVs.

The reference ships a `notebooks/` directory of EMPTY files plus a dataset
downloader (`/root/reference/notebooks/*`, 0 bytes each); these notebooks are
therefore original analyses over this framework's committed artifacts
(docs/examples/csv/*, produced on the real chip by the scripts cited in each
cell). Build + execute:

    python scripts/build_notebooks.py            # write .ipynb sources
    python scripts/build_notebooks.py --execute  # and run them (CPU, offline)
"""
import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# Every notebook starts with this cell so it runs from notebooks/ or the root.
BOOT = """\
import os
if not os.path.exists('docs/examples'):
    os.chdir('..')
import pandas as pd
pd.set_option('display.width', 140)
CSV = 'docs/examples/csv'
"""

MPL = """\
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
"""


def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src}


def code(src):
    return {"cell_type": "code", "metadata": {}, "source": src,
            "outputs": [], "execution_count": None}


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def nb_setup():
    return notebook([
        md("""\
# Environment setup & smoke check

TPU-native stack: jax + flax + optax + orbax. The reference's notebook
counterpart (`/root/reference/notebooks/00_setup_env.ipynb`) is an empty
file; this one actually audits the environment and exercises the offline
data path end-to-end.

Offline note: the axon `sitecustomize` imports jax into every python
process and ignores `JAX_PLATFORMS`; the package `__init__` honors
`JAX_PLATFORM_NAME=cpu`, which this notebook sets so it runs with no TPU
tunnel attached."""),
        code("""\
import os
os.environ.setdefault('JAX_PLATFORM_NAME', 'cpu')
if not os.path.exists('docs/examples'):
    os.chdir('..')
import jax, flax, optax, orbax.checkpoint
import ssl_vit_video_analytics_tpu as pkg
print('jax', jax.__version__, '| backend:', jax.default_backend())
print('flax', flax.__version__, '| optax', optax.__version__)
print('devices:', jax.devices())"""),
        md("""\
## Full environment audit

`env_checker.py` (counterpart of the reference's `env_checker.py`, original
code — TPU/JAX-centric) checks deps, devices, dataset roots and split
files. It exits non-zero when a required piece is missing, which is fine in
a fresh clone."""),
        code("""\
import subprocess, os
env = dict(os.environ, JAX_PLATFORM_NAME='cpu')
r = subprocess.run(['python', 'env_checker.py'], capture_output=True,
                   text=True, env=env)
print(r.stdout[-2500:])
print('exit code:', r.returncode, '(non-zero = missing optional pieces)')"""),
        md("""\
## Offline data path smoke

No dataset in the image, so build the synthetic fixture the test-suite and
the committed chip campaigns use (`data/fixtures.py` — motion- or
appearance-coded classes, packed uint8 frame stores) and pull one batch
through the real loader."""),
        code("""\
import tempfile
import numpy as np
from ssl_vit_video_analytics_tpu.data import fixtures, loader
root = tempfile.mkdtemp(prefix='nb_smoke_')
paths = fixtures.make_synthetic_dataset(root, num_classes=4, videos_per_class=3,
                                        num_frames=8, image_size=64)
ds = loader.ClipDataset(paths['train'], mode='finetune', clip_len=4, stride=1,
                        image_size=64, verbose=False)
clip, label = ds.get_clip(0), ds.label(0)
print('clips:', len(ds), '| clip', clip.shape, clip.dtype, '| label', int(label))
assert clip.shape == (4, 64, 64, 3) and clip.dtype == np.uint8"""),
        md("""\
## Dataset acquisition

For the real datasets use `preprocess/download_dataset.py` (UCF101/HMDB51
URLs + sha256, offline-tolerant: `--offline` emits the synthetic standin),
then `experiments/run_full_pipeline_dataset.sh` for frames → packed arrays
→ splits → verification. See `README.md` Usage."""),
    ])


def nb_performance():
    return notebook([
        md("""\
# Main performance: finetune modes, SSL transfer, throughput

The reference's headline table (its `logs/finetune.log`: UCF101 ft_random
0.8063, two_stage 0.6715 best-val) is a 4-mode finetune comparison over an
SSL-pretrained backbone. This notebook reads the committed chip campaigns
(`docs/examples/csv/`) that reproduce that structure on synthetic fixtures
at increasing scale, plus the label-fraction sweeps that locate where SSL
pretraining actually pays."""),
        code(BOOT + """\
import glob, json
# per-epoch curves for the 4 modes at the small (936-clip) operating point
for f in sorted(glob.glob(f'{CSV}/finetune_*_metrics.csv')):
    df = pd.read_csv(f)
    print(f"{f.split('/')[-1]:42s} best val_top1 = {df.val_top1.max():.4f}")"""),
        md("""\
## The at-scale mode table (the data-size hypothesis)

Identical recipe at three fixture sizes (appearance_signal=1.0, full
labels). The small-fixture accuracy ceilings were **dataset size**, not
framework behavior: 936 → 4608 train clips moved ft_random 0.236 → 0.559
with zero recipe changes. At 4608 clips (half UCF101-train) the mode
ordering is the reference's headline structure with SSL winning:
two_stage > ft_ssl > ft_random ≫ linear_probe
(`docs/ROUND4_NOTES.md` §9; produced by `scripts/ssl_transfer_campaign.py`
queues 5/7/9 on the real chip)."""),
        code("""\
import glob, os
rows = []
MODES = ['ft_random', 'ft_ssl', 'two_stage', 'linear_probe']
for scale, stem in [('936 clips', 'separations'),
                    ('4608 clips', 'separations_big'),
                    ('9216 clips', 'separations_xl')]:
    for mode in MODES:
        f = f'{CSV}/{stem}_{mode}_metrics.csv'
        if not os.path.exists(f):
            continue
        df = pd.read_csv(f)
        rows.append({'scale': scale, 'mode': mode,
                     'best_val_top1': df.val_top1.max(),
                     'final_val_top1': df.val_top1.iloc[-1],
                     'epochs': df.epoch.max()})
t = pd.DataFrame(rows).pivot(index='mode', columns='scale',
                             values='best_val_top1')
print(t.round(4).to_string())
print('\\nreference UCF101 (~9.5k train clips): ft_random 0.8063, '
      'two_stage best 0.6715 (logs/finetune.log)')"""),
        code(MPL + """\
import glob
fig, axes = plt.subplots(1, 2, figsize=(11, 3.6), sharey=True)
for ax, pat, title in [
        (axes[0], f'{CSV}/separations_big_*_metrics.csv', '4608 train clips'),
        (axes[1], f'{CSV}/separations_*_metrics.csv', '936 train clips')]:
    for f in sorted(glob.glob(pat)):
        if ax is axes[1] and ('_big_' in f or '_xl_' in f):
            continue
        df = pd.read_csv(f)
        ax.plot(df.epoch, df.val_top1, label=df['mode'].iloc[0])
    ax.set_xlabel('epoch'); ax.set_title(title); ax.legend(fontsize=8)
axes[0].set_ylabel('val top-1')
fig.tight_layout(); fig.savefig('/tmp/nb_modes.png', dpi=110); plt.show()
print('saved /tmp/nb_modes.png')"""),
        md("""\
## Where SSL transfer pays: the label-fraction sweeps

Two fixtures (motion-coded "hard" and appearance-coded), two checkpoint
families (pipeline-A MobileViT SSL; pipeline-B TinyViT MAE — wiring the
flagship pretrain into finetune is this framework's addition, the
reference never did). Finding: **at 5% labels every SSL-consuming mode
beats ft_random in both families on both fixtures; at full labels with
ample data per class ft_random retakes the lead** (the reference's own
ample-label ordering) — until the backbone is the bottleneck (936-clip
appearance=1.0 fixture: ft_ssl 0.3380 > ft_random 0.2361 at FULL labels).

**Round-5 seed replication caveat:** with 3 training seeds per low-label
cell (`ssl_transfer_sweep_app_{seeds,stats}.csv`) the 5%/10% gaps are
directional but not significant (max pooled z = +0.70); the solid
SSL-vs-random separations are the at-scale full-label ones (z≈+3.1 at
4608 clips, z≈+2.5 at 9216)."""),
        code("""\
for name in ['ssl_transfer_sweep.csv', 'ssl_transfer_sweep_app.csv']:
    df = pd.read_csv(f'{CSV}/{name}')
    print('==', name, '(motion-coded)' if 'app' not in name else '(appearance-coded)')
    print(df.pivot_table(index=['backbone', 'label_fraction'], columns='mode',
                         values='best_top1').round(4).to_string(), '\\n')
import os
if os.path.exists(f'{CSV}/ssl_transfer_sweep_app_stats.csv'):
    st = pd.read_csv(f'{CSV}/ssl_transfer_sweep_app_stats.csv')
    print('== seed-replicate stats (mean +- sd over seeds, pooled Wilson CI)')
    print(st.round(4).to_string(index=False))"""),
        md("""\
## Throughput vs the reference GPU

`bench.py` (pipeline-B MAE train step, production no-clip recipe, bf16,
real chip) prints one JSON line; the reference GPU numbers are from its
committed logs. Head-to-head: pipeline-A 2.4-2.8× faster, serving 3-4×
faster; pipeline-B has no reference number (the reference's pipeline B
crashes — SURVEY §2.10). Kernel story: `BENCH.md`."""),
        code("""\
import json, glob
for f in sorted(glob.glob('BENCH_r*.json')):
    print(f, '->', json.dumps(json.load(open(f)), indent=1))
print('\\nreference GPU baselines (BASELINE.md): pipeline-A 99-119 clips/s;'
      '\\nserving 54-58 ms/clip. This framework: 280.5 clips/s; 3.6-19 ms/clip.')"""),
    ])


def nb_dynamic():
    return notebook([
        md("""\
# Dynamic inference: early exit / frame gating / hybrid

Accuracy-vs-cost frontiers from `entry.run_dynamic` (reference-exact CSV
schemas, frozen by `tests/test_csv_parity.py`). The `_ts` files are the
reference's exact protocol: frontiers traced from the **two_stage best**
checkpoint at the at-scale operating point (val top-1 0.6311), so the
early-exit numbers live near the reference's ~0.66 regime rather than a
weak-checkpoint one."""),
        code(BOOT + """\
ee = pd.read_csv(f'{CSV}/early_exit_ts.csv')
fg = pd.read_csv(f'{CSV}/frame_gating_ts.csv')
hy = pd.read_csv(f'{CSV}/hybrid_ts.csv')
print('== early exit (threshold sweep)'); print(ee.round(4).to_string(index=False))
print('\\n== frame gating (motion top-k)'); print(fg.round(4).to_string(index=False))"""),
        md("""\
## The hybrid headline

The reference's claim: gating + early exit combined recover full-frame
accuracy at a fraction of the frames. Reproduced at the reference-class
operating point: **hybrid k=16 / thr=0.85 reaches 0.6302 vs the full-16-
frame 0.6311 at 7.4 average frames used** (queue 10,
`docs/examples/README.md`)."""),
        code("""\
best = hy.sort_values('top1', ascending=False).head(8)
print(best.round(4).to_string(index=False))
full16 = 0.6311
h = hy[(hy.k == 16) & (hy.threshold == 0.85)]
if len(h):
    r = h.iloc[0]
    print(f'\\nhybrid k=16 thr=0.85: top1 {r.top1:.4f} vs full-16 {full16} '
          f'at {r.avg_used_frames:.1f}/16 frames')"""),
        code(MPL + """\
fig, axes = plt.subplots(1, 2, figsize=(10, 3.6))
axes[0].plot(ee.avg_frames, ee.top1, 'o-', label='early exit (thr sweep)')
axes[0].plot(hy.avg_used_frames, hy.top1, 's', ms=4, alpha=0.6, label='hybrid grid')
axes[0].axhline(0.6311, ls='--', c='gray', lw=1, label='full 16-frame')
axes[0].set_xlabel('avg frames used'); axes[0].set_ylabel('val top-1')
axes[0].legend(fontsize=8); axes[0].set_title('accuracy vs frames (two_stage ckpt)')
axes[1].plot(fg.k, fg.top1, 'o-')
axes[1].set_xlabel('gated frames k'); axes[1].set_title('frame gating')
fig.tight_layout(); fig.savefig('/tmp/nb_dynamic.png', dpi=110); plt.show()
print('saved /tmp/nb_dynamic.png')"""),
        md("""\
## TPU design note

Two equivalence-tested early-exit implementations
(`dynamic.early_exit_impl`): `streaming` (`lax.while_loop`, one frame per
step — the reference's formulation) and `batched` (one fused [B·M]-frame
encode + prefix-mean exit selection; identical statistics, ~5× faster on
the MXU because the while_loop runs until the slowest sample exits
anyway). Thresholds are traced scalars, so a threshold sweep costs ONE
compile."""),
    ])


def nb_privacy():
    return notebook([
        md("""\
# Privacy: visual (YuNet + blur) and feature (noise / mask) layers

Three privacy layers, matching the reference: visual anonymization before
encoding, feature perturbation after encoding, and system-level federation
(notebook 40). `visual_privacy.csv` rows use the REAL vendored YuNet ONNX
face detector; `feature_privacy.csv` is the σ × mask grid with the
reference's rows **plus** the extended σ range that actually moves
leakage (round 4 — the reference's σ ≤ 0.2 is a ~0.13-per-dim-std
perturbation on these embeddings, measurably nothing)."""),
        code(BOOT + """\
vp = pd.read_csv(f'{CSV}/visual_privacy.csv')
print('== visual (blur-kernel sweep, conditional face-leak rate)')
print(vp[['frame_root', 'flr_conditional', 'per_relative',
          'face_frame_rate_before', 'face_frame_rate_after']]
      .round(3).to_string(index=False))"""),
        code("""\
fp = pd.read_csv(f'{CSV}/feature_privacy.csv')
print('== feature grid: utility (top1) and leakage (attacker_top1)')
for v in ['top1', 'attacker_top1']:
    print(f'-- {v}')
    print(fp.pivot_table(index='sigma', columns='mask_ratio', values=v)
          .round(3).to_string())
import os
if os.path.exists(f'{CSV}/feature_privacy_xl.csv'):
    xl = pd.read_csv(f'{CSV}/feature_privacy_xl.csv')
    rep = pd.read_csv(f'{CSV}/feature_privacy_xl_repeats.csv')
    sd = (rep.groupby(['sigma', 'mask_ratio']).attacker_top1.std(ddof=0)
          .rename('attacker_sd'))
    print('\\n== round-5 grid vs the XL ft_ssl best (0.7548), 3 attacker repeats')
    print(xl.join(sd, on=['sigma', 'mask_ratio'])
          [['sigma', 'mask_ratio', 'top1', 'attacker_top1', 'attacker_sd']]
          .round(4).to_string(index=False))"""),
        md("""\
## The calibrated frontier

At mask=0: attacker top-1 0.496 (σ=0) → 0.374 (σ=2) → 0.342 (σ=4) with
utility 0.635 → 0.098 alongside — σ now moves leakage monotonically. The
honest readout: the attacker decays **slower** than utility (54% of clean
attacker accuracy remains when utility hits chance), so masking is the
better per-utility-point lever on this embedding. Reference rows (σ ≤
0.2) are kept for parity."""),
        code(MPL + """\
m0 = fp[fp.mask_ratio == 0.0].sort_values('sigma')
fig, ax = plt.subplots(figsize=(5.5, 3.4))
ax.plot(m0.sigma, m0.top1, 'o-', label='utility (top-1)')
ax.plot(m0.sigma, m0.attacker_top1, 's-', label='leakage (attacker top-1)')
ax.set_xlabel('noise sigma (per-dim embedding std ~1.5)'); ax.legend(fontsize=8)
ax.set_title('feature-noise frontier, mask=0')
fig.tight_layout(); fig.savefig('/tmp/nb_privacy.png', dpi=110); plt.show()
print('saved /tmp/nb_privacy.png')"""),
        md("""\
## Implementation notes

Perturbations are pure functions of PRNG keys (`privacy/feature.py`),
fused into the jitted eval step; the attacker probe is a jitted MLP
trained per grid cell. Visual blur is a batched separable Gaussian on
device; face detection is host OpenCV (YuNet, vendored at
`assets/yunet.onnx`). Figures 18/20 in `docs/examples/` are regenerated
from this grid by `reporting/plotting.py`."""),
    ])


def nb_federated():
    return notebook([
        md("""\
# Federated learning: FedAvg over the device-mesh client axis

The reference simulates clients sequentially on one GPU; here clients are
stacked parameter trees sharded over a mesh `client` axis — all selected
clients train simultaneously under one jitted shard_map'd scan, and
FedAvg aggregation is a weighted cross-client reduction riding ICI
(`federated/core.py`). Comm accounting is parity-checked against the
reference: 103.59 vs 104.35 MB/round."""),
        code(BOOT + """\
cold = pd.read_csv(f'{CSV}/fed_summary_hard_cold.csv')
warm = pd.read_csv(f'{CSV}/fed_summary_hard_warm.csv')
cen = pd.read_csv(f'{CSV}/centralized_summary_hard.csv')
print('== cold FedAvg (at-scale fixture)'); print(cold.round(4).to_string(index=False))
print('\\n== warm FedAvg (init = two_stage best 0.6311, reference protocol)')
print(warm.round(4).to_string(index=False))"""),
        md("""\
## The reference's warm-run signature, reproduced at scale

The reference's federated log starts from its 0.6715 finetuned model and
*degrades* to 0.5992 over federated rounds (non-IID client drift). Same
signature here at the reference-class operating point: warm start from
the 0.6311 two_stage best → 0.5642 best / 0.4852 final, vs cold FedAvg
0.2569 @ round 10 and the centralized ceiling 0.6536 (queue 10,
`docs/examples/README.md`)."""),
        code(MPL + """\
fig, ax = plt.subplots(figsize=(6, 3.4))
ax.plot(cold['round'], cold.val_top1, 'o-', label='cold FedAvg')
ax.plot(warm['round'], warm.val_top1, 's-', label='warm FedAvg (two_stage init)')
ax.axhline(cen.val_top1.max(), ls='--', c='gray', lw=1,
           label=f'centralized peak {cen.val_top1.max():.3f}')
ax.set_xlabel('federated round'); ax.set_ylabel('val top-1'); ax.legend(fontsize=8)
fig.tight_layout(); fig.savefig('/tmp/nb_fed.png', dpi=110); plt.show()
print('saved /tmp/nb_fed.png')"""),
        code("""\
import os
f = f'{CSV}/fed_client_stats.csv'
if os.path.exists(f):
    cs = pd.read_csv(f)
    print('== per-client shard stats (non-IID split, reference RNG stream)')
    print(cs.head(10).to_string(index=False))
print(f"\\ncomm accounting: model {cold.model_mb.iloc[0]:.2f} MB, "
      f"{cold.comm_mb_round.iloc[0]:.2f} MB/round "
      f"(reference: 10.4 MB, 104.35 MB/round — 2·N·size incl. batch_stats)")"""),
        md("""\
## Scaling note

Client-parallelism is real SPMD: `dryrun_multichip` regime 2 jits the full
federated round over an 8-device mesh. Production client sizes exceed HBM
when a full round's clips are stacked on device; `federated/core.py`
chunks the local-step axis (equality-tested) — see
`docs/ROUND4_NOTES.md` §9."""),
    ])


def nb_ablations():
    return notebook([
        md("""\
# Ablations & committed figures

`entry/ablations.py` runs the reference's four grids (sampling /
ssl_objective / privacy / dynamic) as functional `--set` overrides — it
never rewrites config files — and writes one run dir per grid point plus
`ablation_index.json`. This notebook lists the grids and renders the
committed CSV-driven figures (`reporting/plotting.py`)."""),
        code(BOOT + """\
# dry-run the full driver: prints every grid cell's exact command and
# writes ablation_index.json, without training anything
import json, os, subprocess, tempfile
out = tempfile.mkdtemp(prefix='nb_abl_')
env = dict(os.environ, JAX_PLATFORM_NAME='cpu')
r = subprocess.run(['python', '-m', 'ssl_vit_video_analytics_tpu.entry.ablations',
                    '--dry_run', '--out_dir', out], capture_output=True,
                   text=True, env=env)
print(r.stdout)
idx = json.load(open(os.path.join(out, 'ablation_index.json')))
print('grid cells:', len(idx), '| groups:', sorted({e['group'] for e in idx}))"""),
        md("""\
## Example: the mask-ratio ablation, one command

```bash
python -m ssl_vit_video_analytics_tpu.entry.ablations \\
    --grid ssl_objective --max_per_group 2 \\
    --set training.epochs=2 dataset.synthetic=true
```
(`--max_per_group 0` is rejected — it used to silently run the full
grid; ADVICE r3 fix.)"""),
        code("""\
from IPython.display import Image, display
import glob
for f in sorted(glob.glob('docs/examples/figures/fig*.png'))[:8]:
    print(f)
    display(Image(filename=f, width=560))"""),
        code("""\
from IPython.display import Image, display
print('MAE reconstructions (visible patches pasted from input — MAE convention):')
for f in ['docs/examples/figures/mae_recon_hard.png', 'docs/examples/figures/mae_recon_rawpix.png']:
    print(f); display(Image(filename=f, width=560))"""),
        md("""\
## Reading the figures

- `fig17_dynamic_tradeoff_ts.png` — the frontier from the two_stage best
  checkpoint (notebook 20's data).
- `fig18_feature_privacy.png` / `fig20_joint_pareto.png` — the calibrated
  σ grid (notebook 30).
- `fig_separations_big.png` — the at-scale 4-mode table (notebook 10).
- `fig_ssl_dynamics_200.png` — pipeline-A pretext parity at the full
  200-epoch reference horizon (TOP 0.6959 vs the reference's logged
  0.6935).
- `fig_mae_pretrain_200.png` — pipeline-B 200-epoch curve judged on
  epoch-mean loss (the round-3 "late-run drift" was last-logged-step
  sampling noise)."""),
    ])


BUILDERS = {
    "00_setup_env.ipynb": nb_setup,
    "10_main_performance.ipynb": nb_performance,
    "20_dynamic_inference.ipynb": nb_dynamic,
    "30_privacy_analysis.ipynb": nb_privacy,
    "40_federated_learning.ipynb": nb_federated,
    "50_ablation_visuals.ipynb": nb_ablations,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    outdir = os.path.join(ROOT, "notebooks")
    for name, fn in BUILDERS.items():
        if args.only and args.only not in name:
            continue
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            json.dump(fn(), f, indent=1)
        print("wrote", path)
        if args.execute:
            import nbformat
            from nbclient import NotebookClient
            os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
            nb = nbformat.read(path, as_version=4)
            NotebookClient(nb, timeout=600, kernel_name="python3",
                           resources={"metadata": {"path": outdir}}).execute()
            nbformat.write(nb, path)
            print("executed", path)


if __name__ == "__main__":
    main()
