"""Block-tridiagonal Cholesky vs dense reference (analog of the
KKT-solver consistency tests, reference test.py:222-247)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.ops import btsolve


def random_bt_spd(key, T, n, dtype=jnp.float64):
    k1, k2 = jax.random.split(key)
    # SPD diagonal blocks with enough diagonal dominance to keep the whole
    # block-tridiagonal matrix SPD.
    M = jax.random.normal(k1, (T, n, n), dtype)
    D = jnp.einsum("tij,tkj->tik", M, M) + 5.0 * n * jnp.eye(n, dtype=dtype)
    O = 0.3 * jax.random.normal(k2, (T - 1, n, n), dtype)
    return D, O


@pytest.mark.parametrize("T,n", [(5, 3), (12, 4), (2, 2), (30, 6)])
def test_factor_solve_matches_dense(T, n):
    key = jax.random.PRNGKey(0)
    D, O = random_bt_spd(key, T, n)
    b = jax.random.normal(jax.random.PRNGKey(1), (T, n), jnp.float64)

    x = btsolve.factor_solve(D, O, b)
    H = btsolve.to_dense(D, O)
    x_dense = jnp.linalg.solve(H, b.reshape(-1)).reshape(T, n)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_dense), rtol=1e-9, atol=1e-9)


def test_batched_matches_loop():
    T, n, bsz = 7, 5, 6
    keys = jax.random.split(jax.random.PRNGKey(2), bsz)
    Ds, Os = zip(*[random_bt_spd(k, T, n) for k in keys])
    D, O = jnp.stack(Ds), jnp.stack(Os)
    b = jax.random.normal(jax.random.PRNGKey(3), (bsz, T, n), jnp.float64)

    x_batched = btsolve.batched_factor_solve(D, O, b)
    for i in range(bsz):
        xi = btsolve.factor_solve(D[i], O[i], b[i])
        np.testing.assert_allclose(np.asarray(x_batched[i]), np.asarray(xi), rtol=1e-9)


def test_matvec_and_quadratic_form():
    T, n = 6, 4
    D, O = random_bt_spd(jax.random.PRNGKey(4), T, n)
    v = jax.random.normal(jax.random.PRNGKey(5), (T, n), jnp.float64)
    H = btsolve.to_dense(D, O)
    hv = btsolve.matvec(D, O, v)
    np.testing.assert_allclose(
        np.asarray(hv).reshape(-1), np.asarray(H @ v.reshape(-1)), rtol=1e-9
    )
    qf = btsolve.quadratic_form(D, O, v)
    np.testing.assert_allclose(
        float(qf), float(v.reshape(-1) @ H @ v.reshape(-1)), rtol=1e-9
    )


def test_regularization_shifts_diagonal():
    T, n = 4, 3
    D, O = random_bt_spd(jax.random.PRNGKey(6), T, n)
    b = jnp.ones((T, n), jnp.float64)
    x = btsolve.factor_solve(D, O, b, reg=2.5)
    H = btsolve.to_dense(D + 2.5 * jnp.eye(n, dtype=jnp.float64), O)
    np.testing.assert_allclose(
        np.asarray(x).reshape(-1), np.asarray(jnp.linalg.solve(H, b.reshape(-1))),
        rtol=1e-9,
    )


def test_jit_compiles():
    T, n, bsz = 5, 3, 4
    keys = jax.random.split(jax.random.PRNGKey(7), bsz)
    Ds, Os = zip(*[random_bt_spd(k, T, n) for k in keys])
    D, O = jnp.stack(Ds), jnp.stack(Os)
    b = jnp.ones((bsz, T, n), jnp.float64)
    f = jax.jit(btsolve.batched_factor_solve)
    np.testing.assert_allclose(
        np.asarray(f(D, O, b)), np.asarray(btsolve.batched_factor_solve(D, O, b)),
        rtol=1e-12,
    )
