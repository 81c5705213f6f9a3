"""Run the reference deqmpc training on CPU to capture its loss curve.

Matched-loss-curve parity experiment (BASELINE.md north star): train the
reference DEQ-MPC (/root/reference/deqmpc/train.py) on its own pendulum
SAC dataset (data/expert_traj_sac-Pendulum-v0_new.pkl) on CPU float64 with
the run.sh-style config (--deq --deq_iter 6 --bsz 128 --T 5
--solver_type al --qp_solve --pretrain), and tee its per-100-iter printed
losses. The twin run on our side is learning/train.py pointed at the SAME
reference pickle (--data /root/reference/deqmpc/data/... --unwrap_angles
pendulum). Parse both logs with parse_ref_log() below.

The reference has no --iters flag (hardcoded range(20000), train.py:135);
run under `timeout` and keep whatever printed. Nothing is written into
/root/reference (no --save).
"""
from __future__ import annotations

import json
import re
import sys
import types


def run():
    # stub ipdb (imported at reference module top level)
    ipdb = types.ModuleType("ipdb")
    ipdb.set_trace = lambda: None
    sys.modules["ipdb"] = ipdb
    # stub the compiled CUDA dynamics packages (my_envs/cartpole.py:12 etc.
    # imports them at module level; the pendulum path never calls them)
    for pkg in ("cartpole1l", "cartpole1l_v2", "cartpole2l",
                "pendulum1l", "pendulum2l"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    import torch

    # train.py:23 pins the default device to cuda at import time
    torch.set_default_device = lambda *a, **k: None

    import os

    os.chdir("/root/reference/deqmpc")
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/deqmpc")
    sys.argv = ["train.py", "--env", "pendulum", "--deq", "--deq_iter", "6",
                "--bsz", "128", "--T", "5", "--solver_type", "al",
                "--qp_solve", "--pretrain"]
    import train  # the reference's train.py

    # the reference's envs.PendulumEnv (envs.py:84-101) never sets .nq but
    # Tracking_MPC/DEQ layers read it (policies.py:573); their pendulum
    # config only ran with the C++-extension env (my_envs/pendulum.py).
    # nq = #configuration coords = nx//2.
    import envs as ref_envs

    ref_envs.PendulumEnv.nq = property(lambda self: self.nx // 2)
    train.main()


def parse_ref_log(path: str):
    """Parse the reference's printed training log into jsonl-style rows.

    The reference prints, every 100 iters (train.py:178-194):
        iter:  <i> deqmpc|deq
        grad norm:  tensor(...)
        loss:  <avg/deq_iter> loss_end:  <avg> avg time: <s> dyn res: <r>
    """
    rows = []
    cur = None
    for line in open(path):
        m = re.match(r"iter:\s+(\d+)", line)
        if m:
            cur = int(m.group(1))
            continue
        m = re.match(r"loss:\s+([\d.eE+-]+)\s+loss_end:\s+([\d.eE+-]+)"
                     r"\s+avg time:\s+([\d.eE+-]+)\s+dyn res:\s+([\d.eE+-]+)",
                     line)
        if m and cur is not None:
            rows.append({"step": cur,
                         "losses/loss_avg": float(m.group(1)),
                         "losses/loss_end": float(m.group(2)),
                         "stats/step_time_s": float(m.group(3)),
                         "stats/dyn_res": float(m.group(4))})
            cur = None
    return rows


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        for row in parse_ref_log(sys.argv[2]):
            print(json.dumps(row))
    else:
        run()
