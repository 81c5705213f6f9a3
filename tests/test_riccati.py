"""Riccati LQR-KKT solver vs dense KKT oracle (the factorization the
reference builds dense, qp_wrapper.py:638-679 + batch_LU.py:224)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.ops import riccati


def random_lqr(key, T, nx, nu, dtype=jnp.float64):
    ks = jax.random.split(key, 8)
    Lx = jax.random.normal(ks[0], (T, nx, nx), dtype)
    Cxx = jnp.einsum("tij,tkj->tik", Lx, Lx) + 1.0 * jnp.eye(nx, dtype=dtype)
    Lu = jax.random.normal(ks[1], (T, nu, nu), dtype)
    Cuu = jnp.einsum("tij,tkj->tik", Lu, Lu) + 1.0 * jnp.eye(nu, dtype=dtype)
    Cxu = 0.1 * jax.random.normal(ks[2], (T, nx, nu), dtype)
    gx = jax.random.normal(ks[3], (T, nx), dtype)
    gu = jax.random.normal(ks[4], (T, nu), dtype)
    A = jax.random.normal(ks[5], (T - 1, nx, nx), dtype) * 0.5
    B = jax.random.normal(ks[6], (T - 1, nx, nu), dtype)
    r = jax.random.normal(ks[7], (T - 1, nx), dtype)
    dx0 = jax.random.normal(ks[0], (nx,), dtype)
    return Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0


def dense_kkt_solve(Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0):
    """Oracle: assemble the full (T·n + T·nx) KKT matrix and solve."""
    T, nx, nu = np.shape(Cxu)[0], np.shape(Cxx)[-1], np.shape(Cuu)[-1]
    n = nx + nu
    nw = T * n
    neq = T * nx  # T-1 dynamics rows + init row
    K = np.zeros((nw + neq, nw + neq))
    rhs = np.zeros(nw + neq)
    for t in range(T):
        sl = slice(t * n, t * n + nx)
        su = slice(t * n + nx, (t + 1) * n)
        K[sl, sl] = Cxx[t]
        K[sl, su] = Cxu[t]
        K[su, sl] = np.asarray(Cxu[t]).T
        K[su, su] = Cuu[t]
        rhs[sl] = -np.asarray(gx[t])
        rhs[su] = -np.asarray(gu[t])
    # dynamics rows: dx_{t+1} - A dx_t - B du_t = r_t
    for t in range(T - 1):
        row = slice(nw + t * nx, nw + (t + 1) * nx)
        K[row, t * n:t * n + nx] = -np.asarray(A[t])
        K[row, t * n + nx:(t + 1) * n] = -np.asarray(B[t])
        K[row, (t + 1) * n:(t + 1) * n + nx] = np.eye(nx)
        rhs[nw + t * nx:nw + (t + 1) * nx] = np.asarray(r[t])
    # init row
    row = slice(nw + (T - 1) * nx, nw + T * nx)
    K[row, 0:nx] = np.eye(nx)
    rhs[nw + (T - 1) * nx:] = np.asarray(dx0)
    # symmetrize constraint transposes
    K[:nw, nw:] = K[nw:, :nw].T
    sol = np.linalg.solve(K, rhs)
    w = sol[:nw].reshape(T, n)
    return w[:, :nx], w[:, nx:], sol[nw:]


@pytest.mark.parametrize("T,nx,nu", [(5, 3, 2), (12, 4, 1), (2, 2, 2), (25, 6, 3)])
def test_matches_dense_kkt(T, nx, nu):
    params = random_lqr(jax.random.PRNGKey(0), T, nx, nu)
    sol = riccati.lqr_kkt_solve(*params)
    dx_ref, du_ref, mult = dense_kkt_solve(*params)
    np.testing.assert_allclose(np.asarray(sol.dx), dx_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.du), du_ref, rtol=1e-8, atol=1e-8)


def test_kkt_residuals_vanish():
    params = random_lqr(jax.random.PRNGKey(1), 8, 3, 2)
    sol = riccati.lqr_kkt_solve(*params)
    st_x, st_u, feas, feas0 = riccati.kkt_residual(*params, sol)
    assert float(jnp.abs(st_x).max()) < 1e-8
    assert float(jnp.abs(st_u).max()) < 1e-8
    assert float(jnp.abs(feas).max()) < 1e-10
    assert float(jnp.abs(feas0).max()) < 1e-12


def test_batched():
    bsz, T, nx, nu = 5, 6, 3, 2
    keys = jax.random.split(jax.random.PRNGKey(2), bsz)
    all_params = [random_lqr(k, T, nx, nu) for k in keys]
    batched = tuple(jnp.stack([p[i] for p in all_params]) for i in range(9))
    sol = riccati.batched_lqr_kkt_solve(*batched, 0.0)
    for i in range(bsz):
        si = riccati.lqr_kkt_solve(*all_params[i])
        np.testing.assert_allclose(np.asarray(sol.dx[i]), np.asarray(si.dx), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(sol.du[i]), np.asarray(si.du), rtol=1e-9)


def test_elastic_theta_matches_dense_relaxed_kkt():
    """Relaxed dynamics rows (E dw − Θ dν = rhs — the SL1QP elastic
    elimination) vs a dense KKT oracle with −Θ in the (2,2) block."""
    T, nx, nu = 6, 3, 2
    params = random_lqr(jax.random.PRNGKey(3), T, nx, nu)
    Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0 = params
    theta = jax.random.uniform(jax.random.PRNGKey(4), (T - 1, nx),
                               jnp.float64, 0.05, 0.5)

    sol = riccati.lqr_kkt_solve(*params, 0.0, theta)

    # dense oracle
    n = nx + nu
    nw = T * n
    neq = T * nx
    K = np.zeros((nw + neq, nw + neq))
    rhs = np.zeros(nw + neq)
    for t in range(T):
        sl = slice(t * n, t * n + nx)
        su = slice(t * n + nx, (t + 1) * n)
        K[sl, sl] = Cxx[t]
        K[sl, su] = Cxu[t]
        K[su, sl] = np.asarray(Cxu[t]).T
        K[su, su] = Cuu[t]
        rhs[sl] = -np.asarray(gx[t])
        rhs[su] = -np.asarray(gu[t])
    for t in range(T - 1):
        row = slice(nw + t * nx, nw + (t + 1) * nx)
        K[row, t * n:t * n + nx] = -np.asarray(A[t])
        K[row, t * n + nx:(t + 1) * n] = -np.asarray(B[t])
        K[row, (t + 1) * n:(t + 1) * n + nx] = np.eye(nx)
        K[row, row] = -np.diag(np.asarray(theta[t]))  # relaxation block
        rhs[nw + t * nx:nw + (t + 1) * nx] = np.asarray(r[t])
    row = slice(nw + (T - 1) * nx, nw + T * nx)
    K[row, 0:nx] = np.eye(nx)
    rhs[nw + (T - 1) * nx:] = np.asarray(dx0)
    K[:nw, nw:] = K[nw:, :nw].T
    # restore the -Theta diagonal clobbered by the transpose copy
    for t in range(T - 1):
        row = slice(nw + t * nx, nw + (t + 1) * nx)
        K[row, row] = -np.diag(np.asarray(theta[t]))

    dense = np.linalg.solve(K, rhs)
    w = dense[:nw].reshape(T, n)
    nu_dense = dense[nw:].reshape(T, nx)  # rows: dyn t=0..T-2, then init

    np.testing.assert_allclose(np.asarray(sol.dx), w[:, :nx],
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.du), w[:, nx:],
                               rtol=1e-7, atol=1e-8)
    # multipliers: lam[t+1] = dyn-row-t multiplier
    np.testing.assert_allclose(np.asarray(sol.lam[1:]), nu_dense[:-1],
                               rtol=1e-6, atol=1e-7)
