"""AL-MPC solver: convergence + implicit gradients.

Analog of the reference's mpc_test.py (solve + differentiate-through) and
its FD gradient checks (qpth/util.py:715-739), at the reference's solve
budget (al_iter=2, 4 Newton steps, 20-candidate line search).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diff_qp_mpc_tpu.core.types import ALState, Bounds, DiagQuadCost
from diff_qp_mpc_tpu.models import Integrator, Pendulum
from diff_qp_mpc_tpu.solvers import al_mpc


def tracking_setup(model, bsz=4, T=5, seed=0, q=10.0, r=0.01):
    nx, nu = model.nx, model.nu
    n = nx + nu
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x0 = 0.5 * jax.random.normal(ks[0], (bsz, nx), jnp.float64)
    x_ref = jnp.zeros((bsz, T, nx), jnp.float64)  # drive to origin
    Cd = jnp.concatenate(
        [jnp.full((bsz, T, nx), q, jnp.float64), jnp.full((bsz, T, nu), r, jnp.float64)],
        axis=-1,
    )
    xu_ref = jnp.concatenate([x_ref, jnp.zeros((bsz, T, nu), jnp.float64)], axis=-1)
    c = -Cd * xu_ref  # tracking cost p = -Q·xu_ref (policies.py:669-680)
    cost = DiagQuadCost(Cd=Cd, c=c)
    bounds = Bounds(
        u_lo=jnp.full((nu,), -3.0, jnp.float64), u_hi=jnp.full((nu,), 3.0, jnp.float64)
    )
    state = ALState.init(bsz, T, nx, nu, dtype=jnp.float64)
    return x0, cost, bounds, state


def test_integrator_constraint_satisfaction():
    model = Integrator(nx=2, nu=1, dt=0.1)
    x0, cost, bounds, state = tracking_setup(model)
    # At the reference budget (al_iter=2..3, ρ×10) AL converges linearly;
    # residual ~1e-1 is the expected regime. The high-budget test below
    # checks tight convergence.
    cfg = al_mpc.ALConfig(al_iter=3, n_newton=4)
    x, u, new_state, stats = al_mpc.solve(model, cost, x0, bounds, state, cfg)
    assert float(stats.dyn_res.max()) < 0.5, stats.dyn_res
    # x[0] equals x0
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.asarray(x0), atol=1e-5)
    # controls within bounds (small AL violation tolerated)
    assert float(u.max()) <= 3.0 + 0.25
    assert float(u.min()) >= -3.0 - 0.25
    # trajectory actually moves toward the reference (origin)
    assert float(jnp.abs(x[:, -1, 0]).mean()) < float(jnp.abs(x0[:, 0]).mean())


def test_integrator_tight_convergence_high_budget():
    model = Integrator(nx=2, nu=1, dt=0.1)
    x0, cost, bounds, state = tracking_setup(model)
    cfg = al_mpc.ALConfig(al_iter=7, n_newton=4)
    x, u, new_state, stats = al_mpc.solve(model, cost, x0, bounds, state, cfg)
    assert float(stats.dyn_res.max()) < 1e-5, stats.dyn_res
    assert float(jnp.abs(u).max()) <= 3.0 + 1e-4


def test_pendulum_solve_converges():
    model = Pendulum()
    x0, cost, bounds, state = tracking_setup(model, seed=1)
    cfg = al_mpc.ALConfig(al_iter=5, n_newton=4)
    x, u, new_state, stats = al_mpc.solve(model, cost, x0, bounds, state, cfg)
    assert float(stats.dyn_res.max()) < 0.1
    assert not bool(jnp.isnan(x).any())


def test_warm_start_improves_second_solve():
    model = Integrator(nx=2, nu=1, dt=0.1)
    x0, cost, bounds, state = tracking_setup(model)
    cfg = al_mpc.ALConfig(al_iter=2, n_newton=4)
    x, u, s1, stats1 = al_mpc.solve(model, cost, x0, bounds, state, cfg)
    assert not bool(s1.just_initialized)
    x2, u2, s2, stats2 = al_mpc.solve(model, cost, x0, bounds, s1, cfg)
    # warm-started re-solve of the same problem must not regress the
    # residual (small slack for float noise only)
    assert float(stats2.dyn_res.mean()) <= float(stats1.dyn_res.mean()) * 1.05 + 1e-8


def test_implicit_gradient_matches_exact_kkt_sensitivity():
    """custom_vjp implicit grads vs the exact equality-QP KKT sensitivity.

    With linear dynamics and inactive bounds the problem is an equality-
    constrained QP whose solution map c ↦ τ*(c) has closed-form Jacobian
    −K⁻¹ (upper-left block of the KKT inverse). As ρ→∞ the AL implicit
    formula −(Q+ρJᵀJ)⁻¹ converges to the constrained projection
    Z(ZᵀQZ)⁻¹Zᵀ — this is the ground truth the reference's NewtonAL
    backward (al_utils.py:465-500) approximates. (A trusted slow oracle,
    same role as the reference's CVXPY+numdifftools tests, test.py:99-187.)
    """
    model = Integrator(nx=2, nu=1, dt=0.1)
    bsz, T, nx, nu = 2, 4, 2, 1
    n = nx + nu
    x0, cost, _, state = tracking_setup(model, bsz=bsz, T=T, seed=2)
    bounds = Bounds(  # wide → inactive, pure equality QP
        u_lo=jnp.full((nu,), -30.0, jnp.float64),
        u_hi=jnp.full((nu,), 30.0, jnp.float64),
    )
    cfg = al_mpc.ALConfig(al_iter=6, n_newton=8, reg=1e-12)

    @jax.jit
    def loss_implicit(c):
        cost_c = DiagQuadCost(Cd=cost.Cd, c=c)
        x, u, _, _ = al_mpc.solve(model, cost_c, x0, bounds, state, cfg)
        return jnp.sum(x**2) + jnp.sum(u**2)

    g_imp = jax.grad(loss_implicit)(cost.c)

    # exact KKT oracle (numpy, float64)
    A = np.array([[1, 0.1], [0, 1.0]])
    B = np.array([[0.01], [0.1]])
    g_true = np.zeros((bsz, T, n))
    for b in range(bsz):
        Q = np.diag(np.asarray(cost.Cd[b]).reshape(-1))
        cc = np.asarray(cost.c[b]).reshape(-1)
        neq = nx * T
        J = np.zeros((neq, T * n))
        r0 = np.zeros(neq)
        for t in range(T - 1):
            J[t * nx:(t + 1) * nx, t * n:t * n + nx] = -A
            J[t * nx:(t + 1) * nx, t * n + nx:t * n + n] = -B
            J[t * nx:(t + 1) * nx, (t + 1) * n:(t + 1) * n + nx] = np.eye(nx)
        J[(T - 1) * nx:, :nx] = np.eye(nx)
        r0[(T - 1) * nx:] = np.asarray(x0[b])
        K = np.block([[Q, J.T], [J, np.zeros((neq, neq))]])
        w = np.linalg.solve(K, np.concatenate([-cc, r0]))[: T * n]
        dw_dc = -np.linalg.inv(K)[: T * n, : T * n]
        g_true[b] = ((2 * w) @ dw_dc).reshape(T, n)

    np.testing.assert_allclose(
        np.asarray(g_imp), g_true, rtol=5e-2, atol=5e-2
    )


def test_jit_and_grad_compile():
    model = Integrator(nx=2, nu=1, dt=0.1)
    x0, cost, bounds, state = tracking_setup(model)
    cfg = al_mpc.ALConfig()

    @jax.jit
    def step(cost, x0, state):
        x, u, new_state, stats = al_mpc.solve(model, cost, x0, bounds, state, cfg)
        return x, u, new_state

    x, u, s = step(cost, x0, state)
    x2, u2, s2 = step(cost, x0, s)
    assert x.shape == state.x.shape
    assert not bool(jnp.isnan(x2).any())
