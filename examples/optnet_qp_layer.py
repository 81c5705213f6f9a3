"""OptNet-style demo: learn QP-layer parameters by gradient descent.

Capability analog of the reference's OptNet notebooks/examples
(example-cls-layer.ipynb, examples/train.py): a differentiable QP layer
whose parameters (here the linear cost p as a function of the input) are
trained so the argmin matches target outputs — exercising the implicit
backward through the interior-point solve.

Run: python examples/optnet_qp_layer.py [--platform cpu]
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
    ap.add_argument("--iters", type=int, default=150)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from diff_qp_mpc_tpu.solvers.qp import QPConfig, qp_layer

    bsz, nz, nineq, d_in = 64, 4, 6, 3
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)

    # fixed strictly-feasible constraint polytope, shared across the batch
    G1 = jax.random.normal(ks[0], (nineq, nz))
    h1 = jnp.ones((nineq,)) * 2.0
    G = jnp.broadcast_to(G1, (bsz, nineq, nz))
    h = jnp.broadcast_to(h1, (bsz, nineq))
    Q = jnp.broadcast_to(jnp.eye(nz), (bsz, nz, nz))
    A = jnp.zeros((bsz, 0, nz))
    b = jnp.zeros((bsz, 0))

    # ground-truth mapping: x -> argmin with p* = W* x
    W_true = jax.random.normal(ks[1], (nz, d_in))
    x_in = jax.random.normal(ks[2], (bsz, d_in))
    cfg = QPConfig(max_iter=15)
    p_true = x_in @ W_true.T
    z_target = qp_layer(Q, p_true, G, h, A, b, cfg)

    W = 0.1 * jax.random.normal(ks[3], (nz, d_in))
    opt = optax.adam(5e-2)
    opt_state = opt.init(W)

    @jax.jit
    def step(W, opt_state):
        def loss_fn(W):
            z = qp_layer(Q, x_in @ W.T, G, h, A, b, cfg)
            return jnp.mean((z - z_target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(W)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(W, upd), opt_state, loss

    for i in range(args.iters):
        W, opt_state, loss = step(W, opt_state)
        if i % 25 == 0:
            print(f"iter {i:4d} loss {float(loss):.6f}")
    print(f"final loss {float(loss):.6f} (started ~{float(jnp.mean(z_target**2)):.3f} scale)")
    assert float(loss) < 1e-3, "did not learn the QP layer mapping"
    print("OK: learned argmin mapping through the implicit QP backward")


if __name__ == "__main__":
    main()
