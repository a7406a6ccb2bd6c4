"""Round-5 evidence tooling: seed aggregation stats and reset-insurance copy."""
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wilson_interval_sane():
    mk = _load("mk_seed", os.path.join(REPO, "scripts", "make_seed_artifacts.py"))
    lo, hi = mk.wilson(12, 216)
    assert 0.0 < lo < 12 / 216 < hi < 0.12
    lo0, hi0 = mk.wilson(0, 216)
    assert lo0 < 1e-12 and hi0 > 0.0
    # pooling three seeds tightens the interval
    lo3, hi3 = mk.wilson(36, 648)
    assert (hi3 - lo3) < (hi - lo)


def test_make_seed_artifacts_merges_base_and_replicates(tmp_path):
    base = tmp_path / "base.csv"
    base.write_text("backbone,label_fraction,mode,best_top1\n"
                    "mobilevit_s+sslA,0.05,ft_ssl,0.0787\n"
                    "mobilevit_s+sslA,0.05,ft_random,0.0509\n")
    root = tmp_path / "sweep"
    for seed, (ssl, rnd) in {43: (0.083, 0.046), 44: (0.074, 0.056)}.items():
        d = root / f"A_lab05_s{seed}"
        d.mkdir(parents=True)
        (d / "campaign_summary.json").write_text(json.dumps(
            {"best_top1": {"ft_ssl": ssl, "ft_random": rnd}}))
    docs = tmp_path / "docs"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_seed_artifacts.py"),
         "--root", str(root), "--base_csv", str(base), "--docs", str(docs),
         "--name", "t"],
        capture_output=True, text=True, check=True)
    seeds = (docs / "t_seeds.csv").read_text().splitlines()
    assert len(seeds) == 1 + 6  # header + 2 modes x 3 seeds
    stats = (docs / "t_stats.csv").read_text().splitlines()
    assert stats[0] == ("backbone,label_fraction,mode,n_seeds,mean,sd,"
                       "pooled_ci_lo,pooled_ci_hi")
    assert all(",3," in line for line in stats[1:])  # n_seeds=3 both cells
    assert "ft_ssl" in out.stdout and "z=" in out.stdout


def test_insure_artifacts_copies_patterns(tmp_path, monkeypatch):
    ins = _load("insure", os.path.join(REPO, "scripts", "insure_artifacts.py"))
    src = tmp_path / "results"
    (src / "camp" / "ssl").mkdir(parents=True)
    (src / "camp" / "ssl" / "ssl_metrics.csv").write_text("epoch,loss\n1,0.5\n")
    (src / "camp" / "campaign_summary.json").write_text("{}")
    (src / "big.bin").write_bytes(b"\0" * 10)  # no matching suffix -> skipped
    (src / "run.log").write_text("line\n" * 100)
    monkeypatch.setattr(ins, "SRC", str(src))
    monkeypatch.setattr(ins, "DST", str(tmp_path / "dst"))
    ins.main()
    names = sorted(os.listdir(tmp_path / "dst"))
    assert "camp__ssl__ssl_metrics.csv" in names
    assert "camp__campaign_summary.json" in names
    assert "run.log.tail" in names
    assert not any("big" in n for n in names)
