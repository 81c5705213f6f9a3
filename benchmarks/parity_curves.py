"""Matched-loss-curve artifact: reference vs ours on identical data.

Combines the reference training log (benchmarks/ref_train_pendulum.py run,
printed every 100 iters) with our metrics.jsonl from the twin run
(learning/train.py on the reference's own expert pickle) into one
committed artifact: logs/pendulum_parity/{ref_metrics.jsonl, summary.json,
curves.png}. Both runs use the same dataset, batch size, deq_iter, solver
budget, pretrain gating, optimizer, and the same loss definition
(losses.py mirrors policies.py:787-847), so the curves are directly
comparable by iteration.

Usage:
    python benchmarks/parity_curves.py /tmp/ref_train_pendulum.log \
        logs/deqmpc_pendulum_refdata_parity/metrics.jsonl
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
OUT = os.path.join(os.path.dirname(HERE), "logs", "pendulum_parity")


def load_ours(path):
    rows = {}
    for line in open(path):
        d = json.loads(line)
        rows.setdefault(d["step"], {}).update(d)
    return [{**v, "step": k} for k, v in sorted(rows.items())]


def main():
    from ref_train_pendulum import parse_ref_log

    ref_log, ours_jsonl = sys.argv[1], sys.argv[2]
    os.makedirs(OUT, exist_ok=True)
    ref = parse_ref_log(ref_log)
    ours = load_ours(ours_jsonl)
    with open(os.path.join(OUT, "ref_metrics.jsonl"), "w") as f:
        for r in ref:
            f.write(json.dumps(r) + "\n")

    rs = {r["step"]: r for r in ref}
    os_ = {r["step"]: r for r in ours}
    steps = sorted(set(rs) & set(os_))
    full = [s for s in steps if s >= 1100]  # past the pretrain boundary
    summary = {
        "config": "pendulum swing-up DEQ-MPC, reference SAC dataset, "
                  "deq_iter=6 bsz=128 T=5 al_iter=2 lr=1e-3 Adam, "
                  "pretrain 1000 iters, float64",
        "steps_compared": len(steps),
        "ref_final_loss_avg": rs[steps[-1]]["losses/loss_avg"],
        "ours_final_loss_avg": os_[steps[-1]]["losses/loss_avg"],
        "ref_final_loss_end": rs[steps[-1]]["losses/loss_end"],
        "ours_final_loss_end": os_[steps[-1]]["losses/loss_end"],
        "last_step": steps[-1],
        "mean_abs_loss_avg_gap_post_pretrain": float(np.mean(
            [abs(rs[s]["losses/loss_avg"] - os_[s]["losses/loss_avg"])
             for s in full])) if full else None,
        "ref_mean_step_time_s": float(np.mean(
            [r["stats/step_time_s"] for r in ref if r["step"] >= 1100])),
        "ours_mean_step_time_s": float(np.mean(
            [r["stats/step_time_ms"] for r in ours
             if r["step"] >= 1100 and "stats/step_time_ms" in r])) / 1e3,
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for ax, key, title in zip(
                axes, ("losses/loss_avg", "losses/loss_end"),
                ("loss (mean over DEQ iterates)", "loss (final iterate)")):
            ax.plot([r["step"] for r in ref], [r[key] for r in ref],
                    label="reference (torch, CPU f64)", lw=1.6)
            ax.plot([r["step"] for r in ours if key in r],
                    [r[key] for r in ours if key in r],
                    label="ours (JAX, CPU f64)", lw=1.6)
            ax.axvline(1000, color="gray", ls=":", lw=1,
                       label="pretrain → DEQ-MPC")
            ax.set_xlabel("iteration")
            ax.set_title(title)
            ax.set_yscale("log")
            ax.grid(alpha=0.3)
        axes[0].legend()
        fig.suptitle("DEQ-MPC imitation on the reference's pendulum SAC "
                     "dataset — matched configs")
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, "curves.png"), dpi=120)
        print("wrote", os.path.join(OUT, "curves.png"))
    except Exception as e:  # matplotlib is optional
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
