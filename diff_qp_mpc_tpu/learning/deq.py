"""DEQ (deep-equilibrium) network layers, flax-native.

Rebuild of deqmpc/policies.py networks:
- ``DEQCell``/``DEQLayer``: input encoder + weight-tied residual cell +
  output head with the reference's out_type family (policies.py:190-423;
  out_type 1 = state prediction x₁..x_{T−1}, 2 = estimate + prediction,
  0 = control, 3/4 = state+control variants), including the Δq·dt
  integration of configuration outputs (policies.py:224-256).
- ``anderson``: Anderson-accelerated fixed-point solver (policies.py:96-132)
  as a fixed-trip lax.fori_loop.
- ``DEQPolicy``: pure-DEQ baseline with O(1)-memory implicit backward — the
  backward fixed point g = (∂f/∂z)ᵀg + ḡ is solved by the same iteration
  (policies.py:66-87 backward hook), via jax.custom_vjp.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _mish(x: Array) -> Array:
    """Mish activation (reference uses torch.nn.Mish in the gcn cell)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class DEQCell(nn.Module):
    """Weight-tied residual cell (policies.py:279-296, mlp layer_type):
    z₁ = ln₁(relu(fc₁(z)));  out = ln₃(relu(z₁ + ln₂(x + fc₂(z₁))))."""

    hdim: int

    @nn.compact
    def __call__(self, x: Array, z: Array) -> Array:
        z1 = nn.LayerNorm()(nn.relu(nn.Dense(self.hdim)(z)))
        return nn.LayerNorm()(nn.relu(z1 + nn.LayerNorm()(x + nn.Dense(self.hdim)(z1))))


class DEQConvCell(nn.Module):
    """Temporal-conv weight-tied cell (the reference "gcn" layer_type,
    policies.py:287-293: Conv1d over the horizon axis with Mish/GroupNorm,
    expansion factor 4). x, z: [bsz, T, hdim]."""

    hdim: int
    kernel_width: int = 3
    expand: int = 4
    num_groups: int = 4

    @nn.compact
    def __call__(self, x: Array, z: Array) -> Array:
        conv1 = nn.Conv(self.hdim * self.expand, (self.kernel_width,),
                        padding="SAME")
        conv2 = nn.Conv(self.hdim, (self.kernel_width,), padding="SAME")
        z1 = nn.GroupNorm(self.num_groups)(_mish(conv1(z)))
        inner = nn.GroupNorm(self.num_groups)(x + conv2(z1))
        # project z1 back to hdim for the residual (reference adds in the
        # expanded space then convs down; equivalent residual topology)
        z_res = nn.Conv(self.hdim, (1,))(z1)
        return nn.GroupNorm(self.num_groups)(_mish(z_res + inner))


class DEQLayer(nn.Module):
    """One equilibrium iteration: encode input trajectory estimate, run the
    cell, decode a refined trajectory (policies.py:190-423).

    out_type semantics (module returns (traj_ref, z)):
      0: [bsz, T, nu] control sequence
      1: [bsz, T-1, nx] state prediction (x₁..x_{T−1})
      2: [bsz, T, nx] state estimate + prediction
      3: [bsz, T-1, nx+nu] / 4: [bsz, T, nx+nu] state+control variants
    """

    nx: int
    nu: int
    nq: int
    T: int
    hdim: int
    dt: float
    out_type: int = 2
    layer_type: str = "mlp"  # "mlp" | "conv" (reference "gcn")
    kernel_width: int = 3

    def in_dim(self) -> int:
        if self.out_type in (1, 2):
            return self.nx + self.nx * (self.T - 1)
        if self.out_type in (3, 4):
            return self.nx + self.nx * (self.T - 1) + self.nu * self.T
        if self.out_type == 0:
            return self.nu * self.T
        raise NotImplementedError(self.out_type)

    def out_dim(self) -> int:
        return {
            0: self.nu * self.T,
            1: self.nx * (self.T - 1),
            2: self.nx * self.T,
            3: (self.nx + self.nu) * (self.T - 1),
            4: (self.nx + self.nu) * self.T,
        }[self.out_type]

    def init_z(self, bsz: int, dtype=jnp.float32) -> Array:
        if self.layer_type == "conv":
            return jnp.zeros((bsz, self.T, self.hdim), dtype)
        return jnp.zeros((bsz, self.hdim), dtype)

    def _integrate_cfg(self, d: Array, x: Array) -> Array:
        """Configuration channels integrate Δq·dt from the current state;
        velocity channels pass through (policies.py:222-226)."""
        vel = d[..., self.nq:self.nx]
        dq = d[..., : self.nq] * self.dt
        q = dq + x[:, None, : self.nq]
        return jnp.concatenate([q, vel], axis=-1)

    @nn.compact
    def __call__(self, x: Array, traj_flat: Array, z: Array
                 ) -> Tuple[Array, Array]:
        """x: [bsz, nx] current state; traj_flat: [bsz, in_dim] flattened
        trajectory estimate; z: [bsz, hdim] equilibrium latent."""
        if self.layer_type == "conv":
            # per-time-step node encoding + broadcast current-state encoding
            # + learned time embedding (policies.py:265-277 gcn input path)
            bsz = x.shape[0]
            per_t = traj_flat.reshape(bsz, -1)[:, : self.T * self.nx]
            nodes = per_t.reshape(bsz, self.T, self.nx)
            node_emb = nn.Dense(self.hdim)(nodes)
            x0_emb = nn.Dense(self.hdim)(x)[:, None, :]
            t_emb = self.param("time_emb", nn.initializers.normal(0.02),
                               (self.T, self.hdim))
            inp = nn.LayerNorm()(node_emb + x0_emb + t_emb[None])
            z_out = DEQConvCell(self.hdim, self.kernel_width)(inp, z)
            out = nn.Dense(self.out_dim())(z_out.reshape(bsz, -1))
        else:
            inp = nn.LayerNorm()(nn.Dense(self.hdim)(traj_flat))
            z_out = DEQCell(self.hdim)(inp, z)
            out = nn.Dense(self.out_dim())(z_out)

        if self.out_type == 0:
            return out.reshape(-1, self.T, self.nu), z_out
        if self.out_type == 1:
            d = out.reshape(-1, self.T - 1, self.nx)
            return self._integrate_cfg(d, x), z_out
        if self.out_type == 2:
            d = out.reshape(-1, self.T, self.nx)
            return self._integrate_cfg(d, x), z_out
        if self.out_type in (3, 4):
            Td = self.T - 1 if self.out_type == 3 else self.T
            d = out.reshape(-1, Td, self.nx + self.nu)
            x_ref = self._integrate_cfg(d[..., : self.nx], x)
            return jnp.concatenate([x_ref, d[..., self.nx:]], axis=-1), z_out
        raise NotImplementedError(self.out_type)


def anderson(f, z0: Array, m: int = 5, lam: float = 1e-4, max_iter: int = 15,
             tol: float = 1e-2, beta: float = 1.0) -> Tuple[Array, Array]:
    """Anderson acceleration (policies.py:96-132), jit-clean: fixed trip
    count with a convergence mask instead of a host-synced break. Returns
    (z*, residual_history [max_iter])."""
    bsz = z0.shape[0]
    d = z0.reshape(bsz, -1).shape[1]
    dtype = z0.dtype

    X = jnp.zeros((bsz, m, d), dtype)
    F = jnp.zeros((bsz, m, d), dtype)
    X = X.at[:, 0].set(z0.reshape(bsz, -1))
    F = F.at[:, 0].set(f(z0).reshape(bsz, -1))
    X = X.at[:, 1].set(F[:, 0])
    F = F.at[:, 1].set(f(F[:, 0].reshape(z0.shape)).reshape(bsz, -1))

    H0 = jnp.zeros((bsz, m + 1, m + 1), dtype)
    H0 = H0.at[:, 0, 1:].set(1.0).at[:, 1:, 0].set(1.0)
    y = jnp.zeros((bsz, m + 1), dtype).at[:, 0].set(1.0)

    def body(k, carry):
        X, F, res_hist = carry
        n = jnp.minimum(k, m)
        # mask out the unfilled columns so the dense solve is well posed
        col_mask = (jnp.arange(m) < n).astype(dtype)  # [m]
        G = (F - X) * col_mask[None, :, None]
        H = H0.at[:, 1:, 1:].set(
            jnp.einsum("bid,bjd->bij", G, G)
            + lam * jnp.eye(m, dtype=dtype)[None]
        )
        # rows/cols beyond n: identity so alpha there solves to 0
        idx = jnp.arange(m + 1)
        beyond = (idx[None, :] > n) | (idx[:, None] > n)
        H = jnp.where(beyond[None], jnp.eye(m + 1, dtype=dtype)[None], H)
        alpha = jnp.linalg.solve(H, y[..., None])[:, 1:, 0]  # [bsz, m]
        alpha = alpha * col_mask[None]
        xk = beta * jnp.einsum("bm,bmd->bd", alpha, F) \
            + (1 - beta) * jnp.einsum("bm,bmd->bd", alpha, X)
        fk = f(xk.reshape(z0.shape)).reshape(bsz, -1)
        slot = k % m
        X = X.at[:, slot].set(xk)
        F = F.at[:, slot].set(fk)
        res = jnp.linalg.norm(fk - xk, axis=-1) / (1e-5 + jnp.linalg.norm(fk, axis=-1))
        res_hist = res_hist.at[k].set(jnp.mean(res))
        return X, F, res_hist

    res_hist = jnp.zeros((max_iter,), dtype)
    X, F, res_hist = jax.lax.fori_loop(2, max_iter, body, (X, F, res_hist))
    k_last = (max_iter - 1) % m
    return X[:, k_last].reshape(z0.shape), res_hist


def deq_fixed_point(f, z0: Array, fwd_iter: int = 15, bwd_iter: int = 15
                    ) -> Array:
    """Fixed point z* = f(z*) with O(1)-memory implicit backward
    (policies.py:66-87): forward by Anderson iteration (no graph kept),
    backward solves h = (∂f/∂z)ᵀh + ḡ at z* by the same acceleration, and
    parameter cotangents are (∂f/∂θ)ᵀ h* — the exact DEQ implicit VJP.

    ``f`` may close over traced values (e.g. flax parameters);
    closure_convert hoists them into explicit custom_vjp arguments.
    """
    f_closed, closure_args = jax.closure_convert(f, z0)

    @jax.custom_vjp
    def solve(z0, *args):
        z, _ = anderson(lambda z: f_closed(z, *args), z0, max_iter=fwd_iter)
        return f_closed(z, *args)  # re-attach one step (reference f(z, x))

    def solve_fwd(z0, *args):
        z_star = solve(z0, *args)
        return z_star, (z_star, args)

    def solve_bwd(res, g):
        z_star, args = res
        _, vjp_f = jax.vjp(f_closed, z_star, *args)

        def bwd_map(h):
            return vjp_f(h)[0] + g

        h_star, _ = anderson(bwd_map, g, max_iter=bwd_iter)
        arg_cts = vjp_f(h_star)[1:]
        return (jnp.zeros_like(z_star),) + tuple(arg_cts)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve(z0, *closure_args)


class DEQPolicy(nn.Module):
    """Pure-DEQ baseline policy (policies.py:25-94): encode state, solve
    the cell fixed point, decode a T-step state reference."""

    nx: int
    T: int
    hdim: int
    fwd_iter: int = 15

    @nn.compact
    def __call__(self, x: Array) -> Array:
        xinp = nn.LayerNorm()(nn.Dense(self.hdim)(x))
        cell = DEQCell(self.hdim)
        z0 = jnp.zeros((x.shape[0], self.hdim), x.dtype)
        # materialize the cell's params OUTSIDE the fixed-point trace (flax
        # creates them lazily on first call; creating them inside the
        # closure-converted solve leaks tracers)
        _ = cell(xinp, z0)

        def f(z):
            return cell(xinp, z)

        z_star = deq_fixed_point(f, z0, fwd_iter=self.fwd_iter)
        x_ref = nn.Dense(self.nx * self.T)(z_star).reshape(-1, self.T, self.nx)
        return x_ref + x[:, None, : self.nx] * 10.0  # (policies.py:63)


class FFDNetwork(nn.Module):
    """Feedforward reference-trajectory net (policies.py:532-564)."""

    nq: int
    T: int
    hdim: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(nn.LayerNorm()(nn.Dense(self.hdim)(x)))
        h = nn.relu(nn.LayerNorm()(nn.Dense(self.hdim)(h)))
        d = nn.Dense(self.nq * self.T)(h).reshape(-1, self.T, self.nq)
        return d + x[:, None, : self.nq]


class NNPolicy(nn.Module):
    """Behavior-cloning MLP over a horizon (policies.py:719-784)."""

    nx: int
    nu: int
    nq: int
    T: int
    hdim: int
    dt: float
    out_type: int = 1

    @nn.compact
    def __call__(self, x: Array):
        h = nn.relu(nn.LayerNorm()(nn.Dense(self.hdim)(x)))
        h = nn.relu(nn.LayerNorm()(nn.Dense(self.hdim)(h)))
        if self.out_type == 0:
            u = nn.Dense(self.nu * self.T)(h).reshape(-1, self.T, self.nu)
            return None, u
        if self.out_type == 1:
            s = nn.Dense(self.nx * self.T)(h).reshape(-1, self.T, self.nx)
            return s, None
        if self.out_type == 2:
            out = nn.Dense((self.nx + self.nu) * self.T)(h)
            s = out[:, : self.nx * self.T].reshape(-1, self.T, self.nx)
            u = out[:, self.nx * self.T:].reshape(-1, self.T, self.nu)
            return s, u
        if self.out_type == 3:
            pos = nn.Dense(self.nq * self.T)(h).reshape(-1, self.T, self.nq)
            vel = (pos[:, 1:] - pos[:, :-1]) / self.dt
            vel = jnp.concatenate([vel, vel[:, -1:]], axis=1)
            return jnp.concatenate([pos, vel], axis=-1), None
        raise NotImplementedError(self.out_type)
