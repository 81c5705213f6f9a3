"""Parallel-prefix Riccati vs the sequential scan kernel: identical KKT
solutions on random affine LQR problems (the O(log T) horizon-axis kernel,
SURVEY.md §5 / VERDICT r1 missing #5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.ops import riccati, riccati_pprefix


def random_problem(T, nx, nu, seed=0, dtype=jnp.float64):
    rng = np.random.RandomState(seed)
    M = rng.randn(T, nx, nx)
    Cxx = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.5 * np.eye(nx), dtype)
    Cxu = jnp.asarray(0.3 * rng.randn(T, nx, nu), dtype)
    Mu = rng.randn(T, nu, nu)
    Cuu = jnp.asarray(Mu @ Mu.transpose(0, 2, 1) + 1.0 * np.eye(nu), dtype)
    gx = jnp.asarray(rng.randn(T, nx), dtype)
    gu = jnp.asarray(rng.randn(T, nu), dtype)
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.randn(T - 1, nx, nx), dtype)
    B = jnp.asarray(0.2 * rng.randn(T - 1, nx, nu), dtype)
    r = jnp.asarray(0.1 * rng.randn(T - 1, nx), dtype)
    dx0 = jnp.asarray(rng.randn(nx), dtype)
    return Cxx, Cxu, Cuu, gx, gu, A, B, r, dx0


@pytest.mark.parametrize("T,nx,nu", [(5, 3, 1), (16, 2, 1), (33, 4, 2),
                                     (64, 3, 2)])
def test_matches_sequential(T, nx, nu):
    prob = random_problem(T, nx, nu, seed=T)
    seq = riccati.lqr_kkt_solve(*prob, reg=0.0)
    par = riccati_pprefix.lqr_kkt_solve_pprefix(*prob, reg=0.0)
    np.testing.assert_allclose(np.asarray(par.dx), np.asarray(seq.dx),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.du), np.asarray(seq.du),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.lam), np.asarray(seq.lam),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K),
                               rtol=1e-7, atol=1e-8)


def test_kkt_residual_zero():
    """The parallel solution satisfies the KKT system directly (not just
    agreement with the scan)."""
    prob = random_problem(24, 3, 2, seed=7)
    sol = riccati_pprefix.lqr_kkt_solve_pprefix(*prob, reg=0.0)
    st_x, st_u, feas, feas0 = riccati.kkt_residual(*prob, sol)
    assert float(jnp.abs(st_x).max()) < 1e-8
    assert float(jnp.abs(st_u).max()) < 1e-8
    assert float(jnp.abs(feas).max()) < 1e-9
    assert float(jnp.abs(feas0).max()) < 1e-12


def test_batched_and_jit():
    probs = [random_problem(12, 3, 1, seed=s) for s in range(4)]
    batched = tuple(jnp.stack([p[i] for p in probs]) for i in range(9))
    sol = jax.jit(
        lambda *a: riccati_pprefix.batched_lqr_kkt_solve_pprefix(*a, 1e-9)
    )(*batched)
    seq = riccati.batched_lqr_kkt_solve(*batched, 1e-9)
    np.testing.assert_allclose(np.asarray(sol.du), np.asarray(seq.du),
                               rtol=1e-6, atol=1e-7)


def test_f32_stability_long_horizon():
    """T=256 f32: the associative combines must stay finite and close to
    the f64 sequential truth (TPU operating precision)."""
    prob64 = random_problem(256, 3, 1, seed=3)
    prob32 = tuple(a.astype(jnp.float32) for a in prob64)
    seq64 = riccati.lqr_kkt_solve(*prob64, reg=0.0)
    par32 = riccati_pprefix.lqr_kkt_solve_pprefix(*prob32, reg=1e-7)
    assert np.isfinite(np.asarray(par32.du)).all()
    rel = (np.linalg.norm(np.asarray(par32.du) - np.asarray(seq64.du))
           / np.linalg.norm(np.asarray(seq64.du)))
    assert rel < 1e-3, rel
