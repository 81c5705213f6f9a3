"""Pallas Riccati kernel (batch-of-scalars) vs the sequential scan solver,
interpret mode — guards the shared riccati_tiles helper that both the
standalone kernel and the fused trajQP IPM build on."""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.ops import riccati, riccati_pallas


def test_matches_sequential_interpret():
    rng = np.random.RandomState(0)
    B, T, nx, nu = 4, 5, 3, 2
    M = rng.randn(B, T, nx, nx)
    Cxx = jnp.asarray(M @ M.transpose(0, 1, 3, 2) + np.eye(nx))
    Cxu = jnp.asarray(0.2 * rng.randn(B, T, nx, nu))
    Mu = rng.randn(B, T, nu, nu)
    Cuu = jnp.asarray(Mu @ Mu.transpose(0, 1, 3, 2) + np.eye(nu))
    gx = jnp.asarray(rng.randn(B, T, nx))
    gu = jnp.asarray(rng.randn(B, T, nu))
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.randn(B, T - 1, nx, nx))
    Bm = jnp.asarray(0.2 * rng.randn(B, T - 1, nx, nu))
    r = jnp.asarray(0.1 * rng.randn(B, T - 1, nx))
    dx0 = jnp.asarray(rng.randn(B, nx))

    seq = riccati.batched_lqr_kkt_solve(Cxx, Cxu, Cuu, gx, gu, A, Bm, r,
                                        dx0, 1e-9)
    dx, du, lam = riccati_pallas.batched_lqr_kkt_solve(
        Cxx, Cxu, Cuu, gx, gu, A, Bm, r, dx0, reg=1e-9, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(seq.dx),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(du), np.asarray(seq.du),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lam), np.asarray(seq.lam),
                               rtol=1e-8, atol=1e-10)
