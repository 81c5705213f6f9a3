"""Per-robot matched-budget AL-MPC throughput vs the reference CPU qpth.

BASELINE.md target: >=10x batched QP-MPC solves/s vs CPU qpth on
pendulum / cartpole / quadrotor at matched control-sequence error. bench.py
covers pendulum; this harness adds cartpole-1L and the 12-state
RexQuadrotor, importing the reference's own pure-torch dynamics modules
(/root/reference/deqmpc/envs_v1.py:28-90 OneLinkCartpoleDynamics,
/root/reference/deqmpc/rex_quadrotor.py:7-146 RexQuadrotor_dynamics) so
the baseline runs the reference end to end, not a reimplementation.

Protocol per robot (mirrors bench.py):
- throughput at the reference budget (al_iter=2, <=4 Newton, 20-candidate
  line search): reference torch AL_mpc float64 CPU, best over bsz sweep;
  ours = fused Pallas whole-solver kernel on TPU at a large batch.
- control-sequence error at a converged budget (al_iter=8) on a shared
  bsz=64 problem set: median per-element relative L2 of u vs reference.
- a dynamics cross-check row: max |ours.step - reference.forward| on the
  probe states (guards the comparison itself).

Two-phase so the slow CPU reference pass can run while the TPU is busy:
  python benchmarks/prof_vs_reference.py --phase ref    # torch CPU, saves .npz
  python benchmarks/prof_vs_reference.py --phase ours   # TPU, writes JSON
Results merge into benchmarks/vs_reference.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
REF_NPZ = os.path.join(HERE, "vs_reference_ref.npz")
OUT_JSON = os.path.join(HERE, "vs_reference.json")

T = 5
BSZ_REF = (64, 256)
N_REP_REF = 3
BUDGET = dict(al_iter=2, n_newton=4, n_ls=20)
CONV_AL_ITER = 8
ACC_BSZ = 64

# per-robot problem definition: state dim, control dim, diag cost, goal,
# control box, x0 sampler, ours fused batch size
ROBOTS = {
    "cartpole1l": dict(
        nx=4, nu=1,
        Cd=[1.0, 10.0, 0.1, 0.1, 1e-4],
        goal=[0.0, np.pi, 0.0, 0.0, 0.0],
        u_lo=[-100.0], u_hi=[100.0],
        x0_center=[0.0, np.pi, 0.0, 0.0], x0_spread=0.05,
        fused_bsz=65536,
    ),
    "quadrotor": dict(
        nx=12, nu=4,
        Cd=[10.0] * 3 + [1.0] * 9 + [1e-3] * 4,
        # goal control = hover thrust (act_scale'd units), see
        # models/quadrotor.py hover_thrust: (m·g − 4bf)/(4kf)/act_scale
        goal=[0.0] * 12 + [14.4984] * 4,
        u_lo=[11.48] * 4, u_hi=[18.32] * 4,
        x0_center=[0.0] * 12, x0_spread=0.05,
        fused_bsz=8192,
    ),
    # 2-link cartpole stabilization at the both-links-up equilibrium.
    # Reference model: envs_v1.py:226-330 TwoLinkCartpoleDynamics, which
    # measures θ₁ from HORIZONTAL (upright = π/2) with θ₂ relative; ours
    # measures θ₁ from DOWN (upright = π) — the same dynamics under a
    # pure coordinate translation θ₁ → θ₁ − π/2 (verified to 1.4e-13,
    # tests/test_cartpole2l_reference_golden.py), applied via ref_offset
    # to x0/goal before the reference runs. Controls are identical, so
    # control sequences compare directly.
    "cartpole2l": dict(
        nx=6, nu=1,
        Cd=[1.0, 10.0, 10.0, 0.1, 0.1, 0.1, 1e-4],
        goal=[0.0, np.pi, 0.0, 0.0, 0.0, 0.0, 0.0],
        u_lo=[-5.0], u_hi=[5.0],
        x0_center=[0.0, np.pi, 0.0, 0.0, 0.0, 0.0], x0_spread=0.05,
        ref_offset=[0.0, np.pi / 2, 0.0, 0.0, 0.0, 0.0],
        fused_bsz=32768,
    ),
}


def _x0(robot, bsz, seed=0):
    s = ROBOTS[robot]
    rng = np.random.RandomState(seed)
    return (np.asarray(s["x0_center"])[None]
            + rng.uniform(-s["x0_spread"], s["x0_spread"], (bsz, s["nx"])))


def measure_reference(robot):
    import types

    for name in ("ipdb", "cvxpy"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.set_trace = lambda: None
            sys.modules[name] = m
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/deqmpc")
    import torch

    import qpth.AL_mpc as al_mpc_ref
    import qpth.al_utils as al_utils_ref

    torch.manual_seed(0)
    s = ROBOTS[robot]
    nx, nu = s["nx"], s["nu"]
    n = nx + nu

    if robot in ("cartpole1l", "cartpole2l"):
        if robot == "cartpole1l":
            from envs_v1 import OneLinkCartpoleDynamics

            dyn = OneLinkCartpoleDynamics().double()
        else:
            from envs_v1 import TwoLinkCartpoleDynamics

            dyn = TwoLinkCartpoleDynamics().double()

        class Jac(torch.nn.Module):
            def forward(self, x, u):
                eye = torch.eye(nx).double()
                xr = x.unsqueeze(-2).repeat(1, nx, 1).requires_grad_(True)
                ur = u.unsqueeze(-2).repeat(1, nx, 1).requires_grad_(True)
                out = dyn(xr, ur)
                jac = torch.autograd.grad([(out * eye[None]).sum()],
                                          [xr, ur])
                return out[:, 0], jac

        djac = Jac()
    else:
        from rex_quadrotor import (RexQuadrotor_dynamics,
                                   RexQuadrotor_dynamics_jac)

        dyn = RexQuadrotor_dynamics(bsz=max(BSZ_REF)).double()
        djac = RexQuadrotor_dynamics_jac(bsz=max(BSZ_REF)).double()

    Cd = torch.tensor(s["Cd"]).double()
    goal = torch.tensor(s["goal"]).double()
    u_lo = torch.tensor(s["u_lo"]).double()
    u_hi = torch.tensor(s["u_hi"]).double()
    # state-convention translation into the reference model's coordinates
    # (pure coordinate shift: same optimization problem, same controls)
    off = torch.tensor(np.concatenate(
        [np.asarray(s.get("ref_offset", np.zeros(nx))), np.zeros(nu)])
    ).double()
    goal = goal - off

    def run(bsz, n_rep, al_iter):
        ctrl = al_mpc_ref.MPC(
            nx, nu, T, u_lower=u_lo, u_upper=u_hi, al_iter=al_iter,
            exit_unconverged=False, eps=1e-5, n_batch=bsz, backprop=False,
            verbose=0, solver_type="dense", dtype=torch.float64)
        x0 = torch.tensor(_x0(robot, bsz)).double() - off[:nx]
        Q = torch.diag(Cd).repeat(bsz, T, 1, 1)
        p = (-Cd * goal).repeat(bsz, T, 1)
        cost = al_utils_ref.QuadCost(Q, p)
        mask = torch.ones(bsz, T, 1).double()
        u0 = goal[nx:].repeat(bsz, T, 1)  # hover/zero control warm start
        ctrl.reinitialize(x0, mask)
        xs, us = ctrl(x0, cost, dyn, djac, u_init=u0)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_rep):
            ctrl.reinitialize(x0, mask)
            xs, us = ctrl(x0, cost, dyn, djac, u_init=u0)
        per = (time.perf_counter() - t0) / n_rep
        return bsz / per, us.detach().numpy()

    best_sps = 0.0
    for b in BSZ_REF:
        sps, _ = run(b, N_REP_REF, BUDGET["al_iter"])
        print(f"# ref {robot} bsz={b}: {sps:.1f} solves/s", file=sys.stderr)
        best_sps = max(best_sps, sps)
    _, u_ref = run(ACC_BSZ, 1, CONV_AL_ITER)

    # dynamics probe for the cross-check row (stored in REF coordinates)
    xp = torch.tensor(_x0(robot, 32, seed=7)).double() - off[:nx]
    up = torch.tensor(
        np.random.RandomState(7).uniform(s["u_lo"], s["u_hi"], (32, nu)))
    with torch.no_grad():
        fp = dyn(xp, up.double()) if robot.startswith("cartpole") \
            else dyn(xp, up.double())
    return {"solves_per_s": best_sps, "u_ref": u_ref,
            "probe_x": xp.numpy(), "probe_u": up.numpy(),
            "probe_f": fp.numpy()}


def measure_ours(robot, ref):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.models import Cartpole1L, Cartpole2L, RexQuadrotor
    from diff_qp_mpc_tpu.ops.al_fused_pallas import fused_al_solve
    from diff_qp_mpc_tpu.solvers import al_mpc

    s = ROBOTS[robot]
    nx, nu = s["nx"], s["nu"]
    n = nx + nu
    model = {"cartpole1l": Cartpole1L, "cartpole2l": Cartpole2L,
             "quadrotor": RexQuadrotor}[robot]()
    off = np.asarray(s.get("ref_offset", np.zeros(nx)), np.float32)

    # dynamics cross-check on the reference's probe points (probe stored
    # in REF coordinates; evaluate ours in OUR coordinates and map back)
    f_ours = model(jnp.asarray(ref["probe_x"] + off, jnp.float32),
                   jnp.asarray(ref["probe_u"], jnp.float32)) - off
    dyn_err = float(np.max(np.abs(np.asarray(f_ours) - ref["probe_f"])))

    Cd_row = jnp.asarray(s["Cd"], jnp.float32)
    c_row = -Cd_row * jnp.asarray(s["goal"], jnp.float32)
    u_lo = jnp.asarray(s["u_lo"], jnp.float32)
    u_hi = jnp.asarray(s["u_hi"], jnp.float32)

    bsz = s["fused_bsz"]
    x0 = jnp.asarray(_x0(robot, bsz), jnp.float32)
    Cd = jnp.broadcast_to(Cd_row, (bsz, T, n))
    c = jnp.broadcast_to(c_row, (bsz, T, n))
    u_init = jnp.broadcast_to(
        jnp.asarray(s["goal"][nx:], jnp.float32), (bsz, T, nu))
    x_init = model.rollout(x0, u_init)
    from benchmarks.timing import steady_state

    # host-side bound arrays hoisted out of the timed call (a fresh device
    # array inside the loop would force a D2H sync per dispatch and
    # serialize the pipeline — see bench.py)
    u_lo_np = np.asarray(s["u_lo"], np.float32)
    u_hi_np = np.asarray(s["u_hi"], np.float32)

    def run():
        w, *_, r = fused_al_solve(
            model, Cd, c, x0, u_lo_np, u_hi_np, x_init, u_init,
            rho_max=1e4, reg=1e-5, **BUDGET)
        run.res = r
        return w

    run().block_until_ready()
    timing = steady_state(run, n_rep=10, n_outer=5)
    per = timing["per_call_s_median"]
    res = run.res
    sps = bsz / per

    # converged-budget accuracy on the shared problem set (scan path)
    cfg = al_mpc.ALConfig(al_iter=CONV_AL_ITER, n_newton=4, n_ls=20,
                          rho_max=1e6, reg=1e-6)
    x0a = jnp.asarray(_x0(robot, ACC_BSZ), jnp.float32)
    Cda = jnp.broadcast_to(Cd_row, (ACC_BSZ, T, n))
    ca = jnp.broadcast_to(c_row, (ACC_BSZ, T, n))
    st = dq.ALState.init(ACC_BSZ, T, nx, nu, dtype=jnp.float32)
    u_init_a = jnp.broadcast_to(
        jnp.asarray(s["goal"][nx:], jnp.float32), (ACC_BSZ, T, nu))
    _, u_acc, _, _ = al_mpc.solve(
        model, dq.DiagQuadCost(Cd=Cda, c=ca), x0a,
        dq.Bounds(u_lo=u_lo, u_hi=u_hi), st, cfg, u_init=u_init_a)
    u_ours = np.asarray(u_acc, np.float64)
    u_ref = ref["u_ref"]
    rel = (np.linalg.norm((u_ours - u_ref).reshape(ACC_BSZ, -1), axis=-1)
           / (np.linalg.norm(u_ref.reshape(ACC_BSZ, -1), axis=-1) + 1e-12))
    return {
        "solves_per_s": round(sps, 1), "bsz": bsz,
        "ms_per_batch": round(per * 1e3, 2),
        "mean_dyn_res": round(float(jnp.mean(res)), 6),
        "control_seq_median_rel_l2_err_vs_ref": round(
            float(np.median(rel)), 4),
        "dynamics_probe_max_abs_err": dyn_err,
        "timing_spread_max_over_min": round(
            timing["spread_max_over_min"], 3),
        "loadavg1_at_measure": round(timing["loadavg1"], 2),
        "platform": jax.devices()[0].platform,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["ref", "ours"], required=True)
    ap.add_argument("--robot", default="all",
                    choices=["all"] + list(ROBOTS))
    args = ap.parse_args()
    robots = list(ROBOTS) if args.robot == "all" else [args.robot]

    if args.phase == "ref":
        store = dict(np.load(REF_NPZ, allow_pickle=True)) \
            if os.path.exists(REF_NPZ) else {}
        for r in robots:
            ref = measure_reference(r)
            for k, v in ref.items():
                store[f"{r}.{k}"] = v
            print(json.dumps({"robot": r, "phase": "ref",
                              "ref_solves_per_s": round(
                                  ref["solves_per_s"], 1)}))
        np.savez(REF_NPZ, **store)
        return

    store = dict(np.load(REF_NPZ, allow_pickle=True))
    out = json.load(open(OUT_JSON)) if os.path.exists(OUT_JSON) else {}
    for r in robots:
        ref = {k.split(".", 1)[1]: store[f"{r}.{k.split('.', 1)[1]}"]
               for k in store if k.startswith(r + ".")}
        ref["solves_per_s"] = float(ref["solves_per_s"])
        ours = measure_ours(r, ref)
        row = dict(ours)
        row["ref_cpu_solves_per_s"] = round(ref["solves_per_s"], 1)
        row["vs_baseline"] = round(
            ours["solves_per_s"] / ref["solves_per_s"], 1)
        out[r] = row
        print(json.dumps({"robot": r, **row}))
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
