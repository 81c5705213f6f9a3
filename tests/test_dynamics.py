"""Dynamics models: jacfwd Jacobians vs finite differences (analog of the
reference's analytic-vs-FD harness, deqmpc/my_envs/dynamics.py:110-247 and
my_envs/cartpole.py:283-354)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.models import (
    Integrator,
    Pendulum,
    PendulumCosSin,
    finite_diff_jac,
    step_with_jac,
)

MODELS = [
    Pendulum(),
    PendulumCosSin(),
    Integrator(nx=2, nu=1),
    Integrator(nx=4, nu=2),
]


@pytest.mark.parametrize("model", MODELS, ids=lambda m: type(m).__name__ + str(m.nx))
def test_jacfwd_matches_finite_diff(model):
    key = jax.random.PRNGKey(0)
    bsz = 16
    x = jax.random.normal(key, (bsz, model.nx), jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(1), (bsz, model.nu), jnp.float64)

    x_next, (jx, ju) = step_with_jac(model.step)(x, u)
    jx_fd, ju_fd = finite_diff_jac(model.step, eps=1e-6)(x, u)

    np.testing.assert_allclose(np.asarray(jx), np.asarray(jx_fd), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ju), np.asarray(ju_fd), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(model(x, u)), rtol=1e-12)


def test_pendulum_semi_implicit_euler_semantics():
    """Exact reproduction of the reference step (deqmpc/envs.py:23-47)."""
    m = Pendulum()
    x = jnp.array([[0.3, -0.2]])
    u = jnp.array([[0.7]])
    th, thdot = 0.3, -0.2
    thddot = (0.7 + m.m * m.g * m.l * np.sin(th)) / (m.m * m.l**2)
    new_thdot = thdot + thddot * m.dt
    new_th = th + new_thdot * m.dt
    np.testing.assert_allclose(
        np.asarray(m(x, u))[0], [new_th, new_thdot], rtol=1e-12
    )


def test_integrator_semantics():
    m = Integrator(nx=2, nu=1, dt=0.1)
    x = jnp.array([[1.0, 0.5]])
    u = jnp.array([[0.2]])
    vel_n = 0.5 + 0.2 * 0.1
    pos_n = 1.0 + vel_n * 0.1
    np.testing.assert_allclose(np.asarray(m(x, u))[0], [pos_n, vel_n], rtol=1e-12)


def test_rollout_shapes_and_consistency():
    m = Pendulum()
    bsz, T = 4, 6
    x0 = jax.random.normal(jax.random.PRNGKey(2), (bsz, m.nx), jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(3), (bsz, T, m.nu), jnp.float64)
    xs = m.rollout(x0, u)
    assert xs.shape == (bsz, T, m.nx)
    np.testing.assert_allclose(np.asarray(xs[:, 0]), np.asarray(x0))
    # step-by-step agreement
    xt = x0
    for t in range(T - 1):
        xt = m(xt, u[:, t])
        np.testing.assert_allclose(np.asarray(xs[:, t + 1]), np.asarray(xt), rtol=1e-12)


def test_linearize_trajectory():
    m = Integrator(nx=2, nu=1, dt=0.1)
    bsz, T = 3, 5
    x = jax.random.normal(jax.random.PRNGKey(4), (bsz, T, m.nx), jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(5), (bsz, T, m.nu), jnp.float64)
    x_next, A, B = m.linearize(x, u)
    assert A.shape == (bsz, T - 1, m.nx, m.nx)
    # integrator is linear: A = [[1, dt], [0, 1]], B = [[dt^2], [dt]]
    np.testing.assert_allclose(np.asarray(A[0, 0]), [[1.0, 0.1], [0.0, 1.0]], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(B[0, 0]), [[0.01], [0.1]], rtol=1e-12)
