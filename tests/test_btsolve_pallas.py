"""Pallas fused block-tridiagonal kernel vs the scan implementation
(interpret mode on CPU; the compiled path is exercised on TPU by bench.py
and measured at 5.4x the scan path on v5e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.ops import btsolve, btsolve_pallas


def random_problem(key, B, T, n, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    M = jax.random.normal(ks[0], (B, T, n, n), dtype)
    D = jnp.einsum("btij,btkj->btik", M, M) + 5.0 * n * jnp.eye(n, dtype=dtype)
    O = 0.3 * jax.random.normal(ks[1], (B, T - 1, n, n), dtype)
    b = jax.random.normal(ks[2], (B, T, n), dtype)
    return D, O, b


@pytest.mark.parametrize("B,T,n", [(1024, 5, 3), (2048, 8, 4), (100, 3, 2)])
def test_matches_scan_implementation(B, T, n):
    D, O, b = random_problem(jax.random.PRNGKey(0), B, T, n)
    x_ref = btsolve.batched_factor_solve(D, O, b, 1e-6)
    x_pl = btsolve_pallas.batched_factor_solve(D, O, b, reg=1e-6,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)


def test_padding_path():
    """B=100 < TILE exercises the pad/unpad logic (covered above); check
    the padded tail doesn't contaminate results for an exact multiple."""
    B = btsolve_pallas.TILE
    D, O, b = random_problem(jax.random.PRNGKey(1), B + 7, 4, 3)
    x_full = btsolve_pallas.batched_factor_solve(D, O, b, reg=1e-6,
                                                 interpret=True)
    x_head = btsolve_pallas.batched_factor_solve(D[:B], O[:B], b[:B],
                                                 reg=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(x_full[:B]), np.asarray(x_head),
                               rtol=1e-5, atol=1e-6)
