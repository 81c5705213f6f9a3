"""OptNet Sudoku: learn the rules of 4×4 Sudoku as QP constraints.

Capability analog of the reference's example-sudoku.ipynb (upstream
OptNet): puzzles are one-hot encoded z ∈ R^{4·4·4}; the layer solves

    min ½ε‖z‖² − inputᵀ z   s.t.  A z = b,  0 ≤ z ≤ 1

and A (the row/column/box/cell constraint matrix) is LEARNED from solved
puzzles by differentiating through the QP solution — exercising dA/db
gradients of the implicit backward.

Run: python examples/sudoku_optnet.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N = 4  # 4x4 sudoku, 2x2 boxes
NZ = N * N * N  # one-hot cube


def random_solved_sudoku(rng: np.random.RandomState) -> np.ndarray:
    """Generate a random solved 4×4 sudoku via the shifted-base pattern +
    digit/band/stack permutations (standard construction)."""
    base = np.array([[0, 1, 2, 3], [2, 3, 0, 1], [1, 0, 3, 2], [3, 2, 1, 0]])
    digits = rng.permutation(N)
    grid = digits[base]
    # permute rows within bands and columns within stacks
    rows = np.concatenate([rng.permutation(2), 2 + rng.permutation(2)])
    cols = np.concatenate([rng.permutation(2), 2 + rng.permutation(2)])
    return grid[rows][:, cols]


def one_hot(grid: np.ndarray) -> np.ndarray:
    z = np.zeros((N, N, N), np.float32)
    for i in range(N):
        for j in range(N):
            z[i, j, grid[i, j]] = 1.0
    return z.reshape(-1)


def make_dataset(n_samples: int, n_hints: int, rng) -> tuple:
    inputs, targets = [], []
    for _ in range(n_samples):
        grid = random_solved_sudoku(rng)
        z = one_hot(grid)
        mask = np.zeros((N, N), bool)
        idx = rng.choice(N * N, n_hints, replace=False)
        mask[np.unravel_index(idx, (N, N))] = True
        hint = one_hot(grid) * np.repeat(mask.reshape(-1), N)
        inputs.append(hint)
        targets.append(z)
    return jnp.asarray(np.stack(inputs)), jnp.asarray(np.stack(targets))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--bsz", type=int, default=24)
    ap.add_argument("--neq", type=int, default=40, help="learned constraint rows")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from diff_qp_mpc_tpu.solvers.qp import QPConfig, qp_layer

    rng = np.random.RandomState(0)
    X, Z = make_dataset(args.bsz, n_hints=8, rng=rng)
    Xv, Zv = make_dataset(16, n_hints=8, rng=rng)

    neq = args.neq
    eps = 0.1
    cfg = QPConfig(max_iter=18)
    # box 0 <= z <= 1 rows
    G1 = np.concatenate([np.eye(NZ), -np.eye(NZ)], 0).astype(np.float32)
    h1 = np.concatenate([np.ones(NZ), np.zeros(NZ)]).astype(np.float32)

    def solve_batch(A_p, b_p, inputs):
        bsz = inputs.shape[0]
        Q = jnp.broadcast_to(eps * jnp.eye(NZ), (bsz, NZ, NZ))
        p = -inputs
        G = jnp.broadcast_to(jnp.asarray(G1), (bsz,) + G1.shape)
        h = jnp.broadcast_to(jnp.asarray(h1), (bsz,) + h1.shape)
        A = jnp.broadcast_to(A_p, (bsz, neq, NZ))
        b = jnp.broadcast_to(b_p, (bsz, neq))
        return qp_layer(Q, p, G, h, A, b, cfg)

    key = jax.random.PRNGKey(0)
    A_p = 0.1 * jax.random.normal(key, (neq, NZ))
    b_p = jnp.ones((neq,)) * 0.5
    opt = optax.adam(2e-3)
    opt_state = opt.init((A_p, b_p))

    @jax.jit
    def step(params, opt_state):
        A_p, b_p = params

        def loss_fn(params):
            A_p, b_p = params
            z = solve_batch(A_p, b_p, X)
            return jnp.mean((z - Z) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def val_acc(params):
        A_p, b_p = params
        z = solve_batch(A_p, b_p, Xv)
        pred = jnp.argmax(z.reshape(-1, N * N, N), axis=-1)
        true = jnp.argmax(Zv.reshape(-1, N * N, N), axis=-1)
        return jnp.mean(pred == true)

    params = (A_p, b_p)
    loss0 = None
    for i in range(args.iters):
        params, opt_state, loss = step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if i % 25 == 0:
            print(f"iter {i:4d} loss {float(loss):.5f} "
                  f"val cell-accuracy {float(val_acc(params)):.3f}")
    lossN = float(loss)
    acc = float(val_acc(params))
    print(f"loss {loss0:.5f} -> {lossN:.5f}; held-out cell accuracy {acc:.3f}")
    assert lossN < 0.5 * loss0, (loss0, lossN)
    print("OK: learned sudoku constraints through dA/db implicit gradients")


if __name__ == "__main__":
    main()
