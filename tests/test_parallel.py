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
