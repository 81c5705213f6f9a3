"""LQR/MPC imitation: recover cost weights from expert demonstrations.

Analog of the reference's examples/train.py (LQR IL) and
il_exp_nonconvex.py 'empc' mode: an expert MPC with unknown diagonal cost
generates trajectories; a learner MPC recovers the weights by
differentiating the imitation loss through the AL-MPC solver's implicit
backward.

Run: python examples/lqr_imitation.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.models import Integrator
    from diff_qp_mpc_tpu.solvers import al_mpc

    model = Integrator(nx=2, nu=1, dt=0.1)
    bsz, T, nx, nu = 64, 5, 2, 1
    n = nx + nu
    bounds = dq.Bounds(u_lo=jnp.array([-30.0]), u_hi=jnp.array([30.0]))
    cfg = al_mpc.ALConfig(al_iter=6, n_newton=4, rho_max=1e6)
    key = jax.random.PRNGKey(0)
    x0 = 0.7 * jax.random.normal(key, (bsz, nx))

    # MPC solutions are invariant to scaling the whole cost, so weights are
    # only identifiable up to scale: learn a normalized simplex of weights
    # (sum fixed) and compare ratios.
    W_SUM = 3.0

    def weights(log_w):
        return W_SUM * jax.nn.softmax(log_w)

    def solve(log_w, x0):
        Cd = jnp.broadcast_to(weights(log_w), (bsz, T, n))
        cost = dq.DiagQuadCost(Cd=Cd, c=jnp.zeros((bsz, T, n)))
        state = dq.ALState.init(bsz, T, nx, nu)
        x, u, _, _ = al_mpc.solve(model, cost, x0, bounds, state, cfg)
        return x, u

    log_w_true = jnp.log(jnp.array([8.0, 2.0, 0.05]))  # unnormalized expert
    x_exp, u_exp = solve(log_w_true - jax.scipy.special.logsumexp(log_w_true)
                         + jnp.log(1.0), x0)  # same ratios, learnable scale

    log_w = jnp.zeros((n,))  # start at all-ones weights
    opt = optax.adam(optax.exponential_decay(
        3e-2, transition_steps=50, decay_rate=0.5))
    opt_state = opt.init(log_w)

    @jax.jit
    def step(log_w, opt_state):
        def loss_fn(lw):
            x, u = solve(lw, x0)
            return jnp.mean((u - u_exp) ** 2) + jnp.mean((x - x_exp) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(log_w)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(log_w, upd), opt_state, loss

    for i in range(args.iters):
        log_w, opt_state, loss = step(log_w, opt_state)
        if i % 20 == 0:
            print(f"iter {i:4d} loss {float(loss):.6f} "
                  f"weights {np.round(np.asarray(weights(log_w)), 4)}")
    w_learned = np.asarray(weights(log_w))
    w_true = np.asarray(W_SUM * jax.nn.softmax(log_w_true))
    print(f"true (normalized)   {np.round(w_true, 4)}")
    print(f"learned (normalized) {np.round(w_learned, 4)}")
    # the two state weights are strongly identifiable; the tiny control
    # weight only weakly (its effect on trajectories is second order)
    assert float(loss) < 0.1, float(loss)
    ratio_err = np.abs(w_learned[:2] / w_true[:2] - 1.0).max()
    print(f"state-weight ratio error: {ratio_err:.3f}")
    assert ratio_err < 0.1, ratio_err
    print("OK: recovered MPC cost weights through implicit gradients")


if __name__ == "__main__":
    main()
