"""Trajectory QP (IPM + Riccati) vs the generic dense QP solver and the
SLSQP oracle; gradient checks for the differentiable layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.core.types import Bounds
from diff_qp_mpc_tpu.solvers import oracles, trajqp
from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig


def random_traj_qp(key, bsz, T, nx, nu, dtype=jnp.float64, tight=False):
    ks = jax.random.split(key, 8)
    n = nx + nu
    L = jax.random.normal(ks[0], (bsz, T, n, n), dtype) * 0.3
    C = jnp.einsum("btij,btkj->btik", L, L) + jnp.eye(n, dtype=dtype)
    c = jax.random.normal(ks[1], (bsz, T, n), dtype) * (3.0 if tight else 1.0)
    A = jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(ks[2], (bsz, T - 1, nx, nx), dtype)
    B = jax.random.normal(ks[3], (bsz, T - 1, nx, nu), dtype)
    f = 0.1 * jax.random.normal(ks[4], (bsz, T - 1, nx), dtype)
    x0 = jax.random.normal(ks[5], (bsz, nx), dtype)
    bounds = Bounds(u_lo=jnp.full((nu,), -1.0, dtype), u_hi=jnp.full((nu,), 1.0, dtype))
    return C, c, A, B, f, x0, bounds


def dense_qp_from_traj(C, c, A, B, f, x0, bounds, b):
    """Flatten one trajectory QP instance to (Q, p, G, h, Aeq, beq) numpy."""
    T, n = C.shape[1], C.shape[2]
    nx = A.shape[-1]
    nu = n - nx
    nw = T * n
    Q = np.zeros((nw, nw))
    p = np.zeros(nw)
    for t in range(T):
        Q[t * n:(t + 1) * n, t * n:(t + 1) * n] = np.asarray(C[b, t])
        p[t * n:(t + 1) * n] = np.asarray(c[b, t])
    neq = T * nx
    Aeq = np.zeros((neq, nw))
    beq = np.zeros(neq)
    for t in range(T - 1):
        r = slice(t * nx, (t + 1) * nx)
        Aeq[r, t * n:t * n + nx] = -np.asarray(A[b, t])
        Aeq[r, t * n + nx:(t + 1) * n] = -np.asarray(B[b, t])
        Aeq[r, (t + 1) * n:(t + 1) * n + nx] = np.eye(nx)
        beq[r] = np.asarray(f[b, t])
    Aeq[(T - 1) * nx:, :nx] = np.eye(nx)
    beq[(T - 1) * nx:] = np.asarray(x0[b])
    # box on u rows
    G = np.zeros((2 * T * nu, nw))
    h = np.zeros(2 * T * nu)
    for t in range(T):
        for j in range(nu):
            G[2 * (t * nu + j), t * n + nx + j] = 1.0
            h[2 * (t * nu + j)] = float(np.asarray(bounds.u_hi)[j])
            G[2 * (t * nu + j) + 1, t * n + nx + j] = -1.0
            h[2 * (t * nu + j) + 1] = -float(np.asarray(bounds.u_lo)[j])
    return Q, p, G, h, Aeq, beq


@pytest.mark.parametrize("tight", [False, True], ids=["inactive", "active"])
def test_matches_oracle(tight):
    bsz, T, nx, nu = 3, 5, 2, 1
    C, c, A, B, f, x0, bounds = random_traj_qp(
        jax.random.PRNGKey(0), bsz, T, nx, nu, tight=tight)
    sol = trajqp.solve(C, c, A, B, f, x0, bounds, TrajQPConfig(max_iter=20))
    for b in range(bsz):
        Qd, pd, Gd, hd, Aeq, beq = dense_qp_from_traj(C, c, A, B, f, x0, bounds, b)
        z_ref, *_ = oracles.solve_qp_np(Qd, pd, Gd, hd, Aeq, beq)
        w = np.concatenate(
            [np.asarray(sol.x[b]), np.asarray(sol.u[b])], axis=-1).reshape(-1)
        np.testing.assert_allclose(w, z_ref, rtol=1e-4, atol=1e-5)


def test_bounds_respected():
    bsz, T, nx, nu = 4, 6, 3, 2
    C, c, A, B, f, x0, bounds = random_traj_qp(
        jax.random.PRNGKey(1), bsz, T, nx, nu, tight=True)
    sol = trajqp.solve(C, c, A, B, f, x0, bounds, TrajQPConfig(max_iter=20))
    assert float(sol.u.max()) <= 1.0 + 1e-6
    assert float(sol.u.min()) >= -1.0 - 1e-6
    # dynamics feasible
    xs = sol.x
    pred = jnp.einsum("btij,btj->bti", A, xs[:, :-1]) + \
        jnp.einsum("btij,btj->bti", B, sol.u[:, :-1]) + f
    assert float(jnp.abs(xs[:, 1:] - pred).max()) < 1e-6
    np.testing.assert_allclose(np.asarray(xs[:, 0]), np.asarray(x0), atol=1e-8)


@pytest.mark.parametrize("wrt", ["C", "c", "x0"])
def test_gradients_vs_fd(wrt):
    bsz, T, nx, nu = 2, 4, 2, 1
    params = random_traj_qp(jax.random.PRNGKey(2), bsz, T, nx, nu)
    C, c, A, B, f, x0, bounds = params
    cfg = TrajQPConfig(max_iter=25, reg=1e-11)
    names = {"C": 0, "c": 1, "x0": 5}
    idx = names[wrt]

    @jax.jit
    def loss(theta):
        args = list(params[:7])
        args[idx] = theta
        w = trajqp.traj_qp_layer(*args, cfg)
        return jnp.sum(w**2)

    theta0 = params[idx]
    g = jax.grad(loss)(theta0)
    rng = np.random.RandomState(0)
    flat = np.asarray(theta0).reshape(-1)
    eps = 1e-6
    for ci in rng.choice(flat.size, size=min(6, flat.size), replace=False):
        e = np.zeros_like(flat)
        e[ci] = eps
        pert = jnp.asarray(e.reshape(theta0.shape))
        if wrt == "C":
            pert = 0.5 * (pert + jnp.swapaxes(pert, -1, -2))
        fd = (float(loss(theta0 + pert)) - float(loss(theta0 - pert))) / (2 * eps)
        gi = float(np.asarray(g).reshape(-1)[ci])
        assert abs(gi - fd) < 1e-2 + 1e-3 * abs(fd), (wrt, ci, gi, fd)


def test_elastic_matches_hard_when_feasible():
    """μ large + feasible ⇒ slacks → 0 and the elastic solve equals the
    hard-constrained solve (structured SL1QP path, solve_elastic)."""
    bsz, T, nx, nu = 3, 5, 2, 1
    C, c, A, B, f, x0, bounds = random_traj_qp(
        jax.random.PRNGKey(5), bsz, T, nx, nu)
    hard = trajqp.solve(C, c, A, B, f, x0, bounds, TrajQPConfig(max_iter=20))
    el = trajqp.solve_elastic(C, c, A, B, f, x0, bounds, mu=50.0,
                              cfg=TrajQPConfig(max_iter=25))
    assert float(el.slack_l1.max()) < 1e-6
    np.testing.assert_allclose(np.asarray(el.u), np.asarray(hard.u),
                               rtol=1e-6, atol=1e-7)


def test_elastic_absorbs_infeasibility():
    """Uncontrollable tight problem: the hard QP has no feasible point that
    also respects the bounds; the elastic solve stays finite and reports
    the violation in the slacks."""
    bsz, T, nx, nu = 2, 4, 2, 1
    n = nx + nu
    C = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (bsz, T, n, n))
    c = jnp.zeros((bsz, T, n), jnp.float64)
    # dynamics demand a huge jump: x' = x + 10 (B ~ 0 ⇒ no control authority)
    A = jnp.broadcast_to(jnp.eye(nx, dtype=jnp.float64), (bsz, T - 1, nx, nx))
    B = jnp.zeros((bsz, T - 1, nx, nu), jnp.float64) + 1e-6
    f = jnp.full((bsz, T - 1, nx), 10.0, jnp.float64)
    x0 = jnp.zeros((bsz, nx), jnp.float64)
    bounds = Bounds(u_lo=jnp.full((nu,), -1.0), u_hi=jnp.full((nu,), 1.0))
    el = trajqp.solve_elastic(C, c, A, B, f, x0, bounds, mu=0.5,
                              cfg=TrajQPConfig(max_iter=25))
    assert not bool(jnp.isnan(el.x).any())
    # with mu=0.5 < marginal cost of tracking the jump, slacks absorb it
    assert float(el.slack_l1.min()) > 1.0
