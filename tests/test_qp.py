"""Differentiable QP layer: forward vs SLSQP oracle, backward vs finite
differences (analog of reference test.py:99-187 gradient tests vs CVXPY +
numdifftools; tolerances test.py:35-36 ATOL=1e-2 RTOL=1e-4 class)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.solvers import oracles
from diff_qp_mpc_tpu.solvers.qp import QPConfig, qp_layer, qp_solve


def random_qp(key, bsz, nz, nineq, neq, dtype=jnp.float64):
    """Feasible-by-construction random QPs (reference test.py:46-55:
    h = G z0 + s0, b = A z0)."""
    ks = jax.random.split(key, 6)
    L = jax.random.normal(ks[0], (bsz, nz, nz), dtype)
    Q = jnp.einsum("bij,bkj->bik", L, L) + 0.5 * jnp.eye(nz, dtype=dtype)
    p = jax.random.normal(ks[1], (bsz, nz), dtype)
    G = jax.random.normal(ks[2], (bsz, nineq, nz), dtype)
    z0 = jax.random.normal(ks[3], (bsz, nz), dtype)
    s0 = jax.random.uniform(ks[4], (bsz, nineq), dtype, 0.2, 1.0)
    h = jnp.einsum("bij,bj->bi", G, z0) + s0
    A = jax.random.normal(ks[5], (bsz, neq, nz), dtype)
    b = jnp.einsum("bij,bj->bi", A, z0)
    return Q, p, G, h, A, b


@pytest.mark.parametrize("neq", [0, 2])
def test_forward_matches_oracle(neq):
    bsz, nz, nineq = 6, 5, 4
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(0), bsz, nz, nineq, neq)
    sol = qp_solve(Q, p, G, h, A, b, QPConfig(max_iter=25))
    for i in range(bsz):
        z_ref, lam_ref, nu_ref, _ = oracles.solve_qp_np(
            np.asarray(Q[i]), np.asarray(p[i]), np.asarray(G[i]),
            np.asarray(h[i]), np.asarray(A[i]) if neq else None,
            np.asarray(b[i]) if neq else None,
        )
        np.testing.assert_allclose(
            np.asarray(sol.z[i]), z_ref, rtol=1e-4, atol=1e-5
        )


def test_constraints_satisfied():
    bsz, nz, nineq, neq = 8, 6, 5, 2
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(1), bsz, nz, nineq, neq)
    sol = qp_solve(Q, p, G, h, A, b)
    viol_ineq = jnp.einsum("bij,bj->bi", G, sol.z) - h
    viol_eq = jnp.einsum("bij,bj->bi", A, sol.z) - b
    assert float(viol_ineq.max()) < 1e-6
    assert float(jnp.abs(viol_eq).max()) < 1e-6
    assert float(sol.lam.min()) > -1e-8  # dual feasibility


@pytest.mark.parametrize("wrt", ["Q", "p", "G", "h", "A", "b"])
def test_gradients_vs_finite_diff(wrt):
    bsz, nz, nineq, neq = 2, 4, 3, 1
    params = random_qp(jax.random.PRNGKey(2), bsz, nz, nineq, neq)
    names = ["Q", "p", "G", "h", "A", "b"]
    idx = names.index(wrt)
    cfg = QPConfig(max_iter=30, kkt_reg=1e-9)

    @jax.jit
    def loss(theta):
        args = list(params)
        args[idx] = theta
        z = qp_layer(*args, cfg)
        return jnp.sum(z**2)

    theta0 = params[idx]
    g = jax.grad(loss)(theta0)

    # central finite differences on a few random coordinates
    rng = np.random.RandomState(0)
    flat = np.asarray(theta0).reshape(-1)
    eps = 1e-6
    n_probe = min(6, flat.size)
    coords = rng.choice(flat.size, size=n_probe, replace=False)
    for ci in coords:
        e = np.zeros_like(flat)
        e[ci] = eps
        pert = jnp.asarray(e.reshape(theta0.shape))
        if wrt == "Q":
            # the layer's dQ is symmetrized (qp.py:174 math); probe with a
            # symmetric perturbation so directions are comparable
            # ⟨g, pert⟩/eps = g[ci] for both diagonal and off-diagonal
            pert = 0.5 * (pert + jnp.swapaxes(pert, -1, -2))
        fd = (float(loss(theta0 + pert)) - float(loss(theta0 - pert))) / (2 * eps)
        gi = float(np.asarray(g).reshape(-1)[ci])
        # reference tolerance class (test.py:35-36)
        assert abs(gi - fd) < 1e-2 + 1e-4 * abs(fd), (wrt, ci, gi, fd)


def test_symmetry_of_dQ():
    bsz, nz, nineq, neq = 2, 4, 3, 0
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(3), bsz, nz, nineq, neq)

    def loss(Q):
        return jnp.sum(qp_layer(Q, p, G, h, A, b) ** 3)

    dQ = jax.grad(loss)(Q)
    np.testing.assert_allclose(
        np.asarray(dQ), np.asarray(jnp.swapaxes(dQ, -1, -2)), rtol=1e-10
    )


def test_jit():
    bsz, nz, nineq, neq = 4, 5, 4, 2
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(4), bsz, nz, nineq, neq)
    f = jax.jit(lambda *a: qp_solve(*a).z)
    np.testing.assert_allclose(
        np.asarray(f(Q, p, G, h, A, b)),
        np.asarray(qp_solve(Q, p, G, h, A, b).z),
        rtol=1e-10,
    )


@pytest.mark.parametrize("neq", [0, 2])
def test_prefactor_solver_matches_dense(neq):
    """Q-prefactored Schur path (reference pre_factor_kkt scheme,
    batch.py:377-469; VERDICT r1 missing #6) vs the dense full-KKT path:
    same solutions and duals."""
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(5), 4, 8, 6, neq)
    sol_d = qp_solve(Q, p, G, h, A, b, QPConfig(solver="dense"))
    sol_s = qp_solve(Q, p, G, h, A, b, QPConfig(solver="prefactor"))
    np.testing.assert_allclose(np.asarray(sol_s.z), np.asarray(sol_d.z),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_s.lam), np.asarray(sol_d.lam),
                               rtol=1e-5, atol=1e-6)
    assert float(sol_s.resids.max()) < 1e-6


def test_prefactor_layer_gradients():
    """qp_layer differentiates identically through the prefactor path."""
    Q, p, G, h, A, b = random_qp(jax.random.PRNGKey(6), 2, 6, 4, 0)
    g_d = jax.grad(lambda p_: jnp.sum(
        qp_layer(Q, p_, G, h, A, b, QPConfig(solver="dense")) ** 2))(p)
    g_s = jax.grad(lambda p_: jnp.sum(
        qp_layer(Q, p_, G, h, A, b, QPConfig(solver="prefactor")) ** 2))(p)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-6)
