"""Cartpole / quadrotor / rotation-math model tests.

Physics validation strategy: closed-form cross-checks for the 1-link
cartpole, energy conservation for the Lagrangian-derived models (no
control, no damping ⇒ E constant under RK4 to integrator accuracy — the
role of the reference's FD-vs-analytic and ALTRO cross-checks,
my_envs/cartpole.py:283-354, test_trajopt_altro.jl), jacfwd-vs-FD for all,
and algebraic identities for the attitude math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.models import (
    Cartpole1L,
    Cartpole2L,
    CartpoleCosSin,
    RexQuadrotor,
    finite_diff_jac,
    rotation,
    step_with_jac,
)

MODELS = [Cartpole1L(), Cartpole2L(), CartpoleCosSin(), RexQuadrotor()]


@pytest.mark.parametrize("model", MODELS, ids=lambda m: type(m).__name__)
def test_jacfwd_matches_finite_diff(model):
    bsz = 8
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (bsz, model.nx), jnp.float64)
    u = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (bsz, model.nu), jnp.float64)
    _, (jx, ju) = step_with_jac(model.step)(x, u)
    jx_fd, ju_fd = finite_diff_jac(model.step, eps=1e-6)(x, u)
    np.testing.assert_allclose(np.asarray(jx), np.asarray(jx_fd), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ju), np.asarray(ju_fd), rtol=1e-4, atol=1e-6)


def test_cartpole1l_matches_closed_form():
    """Manipulator-equation dynamics vs the textbook closed form
    ẍ = (u + m l θ̇² sinθ + m g sinθ cosθ) / (M + m sin²θ)
    (the expression the reference hardcodes, envs_v1.py:73-74, with its
    g = −9.81 convention folded in)."""
    m = Cartpole1L()
    x = jnp.array([0.3, 1.1, -0.4, 0.8])
    u = jnp.array([2.5])
    xd = m._ode(x, u)
    th, thd = x[1], x[3]
    M_, mp, l, g = m.M, m.m, m.l, m.g
    x_ddot = (float(u[0]) + mp * l * thd**2 * jnp.sin(th)
              + mp * g * jnp.sin(th) * jnp.cos(th)) / (M_ + mp * jnp.sin(th)**2)
    th_ddot = -(jnp.cos(th) * x_ddot + g * jnp.sin(th)) / l
    np.testing.assert_allclose(float(xd[2]), float(x_ddot), rtol=1e-10)
    np.testing.assert_allclose(float(xd[3]), float(th_ddot), rtol=1e-10)
    # velocity passthrough
    np.testing.assert_allclose(np.asarray(xd[:2]), np.asarray(x[2:]), rtol=1e-12)


@pytest.mark.parametrize("model,steps,tol", [
    (Cartpole1L(), 50, 1e-3),
    # the 2-link is chaotic: keep the horizon inside RK4-at-dt=0.05's
    # predictability window and budget for Lyapunov growth (the
    # midpoint-mass envs_v1 dynamics spin faster than the pre-r4
    # tip-mass transcription did) — a sign/assembly error still fails
    # this by orders of magnitude
    (Cartpole2L(), 10, 5e-2),
    (Cartpole2L.pkg(), 10, 5e-2),
], ids=["1link", "2link", "2link-pkg"])
def test_integration_consistency_unforced(model, steps, tol):
    """Unforced rollout endpoint must agree with a 10× finer-dt integration
    of the same ODE (catches sign/assembly errors in the Lagrangian
    machinery; conservative systems amplify any energy leak)."""
    bsz = 4
    q = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (bsz, model.nq), jnp.float64)
    qd = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (bsz, model.nq), jnp.float64)
    x = jnp.concatenate([q, qd], axis=-1)
    u = jnp.zeros((bsz, model.nu), jnp.float64)

    kw = {}
    if isinstance(model, Cartpole2L):
        kw = dict(M=model.M, com=model.com, link_inertia=model.link_inertia)
    fine = type(model)(dt=model.dt / 10, **kw)

    @jax.jit
    def roll_coarse(x):
        return jax.lax.fori_loop(0, steps, lambda _, xt: model(xt, u), x)

    @jax.jit
    def roll_fine(x):
        return jax.lax.fori_loop(0, steps * 10, lambda _, xt: fine(xt, u), x)

    np.testing.assert_allclose(np.asarray(roll_coarse(x)),
                               np.asarray(roll_fine(x)),
                               rtol=1e-2, atol=tol)


def test_quadrotor_hover_equilibrium():
    """At hover thrust with level attitude the quadrotor stays put."""
    m = RexQuadrotor()
    x = jnp.zeros((1, 12), jnp.float64)
    u = jnp.broadcast_to(m.hover_thrust(), (1, 4)).astype(jnp.float64)
    xd = jax.vmap(m._ode)(x, u)
    np.testing.assert_allclose(np.asarray(xd), np.zeros((1, 12)), atol=1e-8)
    # and slight excess thrust climbs (body z maps to world z at identity)
    xd2 = jax.vmap(m._ode)(x, u * 1.1)
    assert float(xd2[0, 8]) > 0  # v̇_z > 0


def test_mrp_quaternion_roundtrip():
    key = jax.random.PRNGKey(4)
    m = 0.5 * jax.random.normal(key, (16, 3), jnp.float64)
    q = rotation.mrp_to_quat(m)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(q, axis=-1)), np.ones(16), rtol=1e-12)
    m2 = rotation.quat_to_mrp(q)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-10)


def test_quat_rotate_preserves_norm_and_matches_matrix():
    key = jax.random.PRNGKey(5)
    m = 0.3 * jax.random.normal(key, (8, 3), jnp.float64)
    r = jax.random.normal(jax.random.PRNGKey(6), (8, 3), jnp.float64)
    q = rotation.mrp_to_quat(m)
    rq = rotation.quat_rotate(q, r)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(rq, axis=-1)),
        np.asarray(jnp.linalg.norm(r, axis=-1)), rtol=1e-10)
    R = rotation.mrp_to_rot(m)
    np.testing.assert_allclose(
        np.asarray(rq), np.asarray(jnp.einsum("bij,bj->bi", R, r)), rtol=1e-9)


def test_mrp_kinematics_zero_rate():
    m = jnp.array([[0.1, -0.2, 0.3]])
    np.testing.assert_allclose(
        np.asarray(rotation.mrp_kinematics(m, jnp.zeros((1, 3)))),
        np.zeros((1, 3)))
