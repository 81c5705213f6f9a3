#!/usr/bin/env bash
# Flagship DEQ-MPC training configuration (the reference's deqmpc/run.sh:
#   python train.py --deq --deq_iter 6 --bsz 256 --T 5 --solver_type al \
#       --env integrator --qp_solve --test --pretrain)
set -e
# 1. generate expert data with the MPC expert (once)
[ -f data/expert_traj_mpc-Integrator-v0_new.pkl ] || \
  python -m diff_qp_mpc_tpu.learning.datagen --env integrator \
      --num_traj 200 --T 20 --max_steps 60 "$@"
# 2. train DEQ-MPC
python -m diff_qp_mpc_tpu.learning.train --env integrator --deq \
    --deq_iter 6 --bsz 256 --T 5 --solver_type al --qp_solve --pretrain \
    --save "$@"
