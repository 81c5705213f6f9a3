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
