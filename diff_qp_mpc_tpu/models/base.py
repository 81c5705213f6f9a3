"""Dynamics model base: pure functions + jacfwd Jacobians + integrators.

TPU-native replacement for the reference's three dynamics families —
pure-torch nn.Modules (deqmpc/envs.py:5-57), the repeated-input autograd
Jacobian trick (deqmpc/envs.py:68-82), and the CasADi-generated C/CUDA
packages with analytic derivatives (deqmpc/my_envs/*/src/*.c,
dynamics_gpu.cu). In JAX the idiomatic equivalent of "generated C with
analytic Jacobians" is a closed-form step function traced once by XLA and
differentiated with ``jacfwd`` — the whole batched step+Jacobian fuses into
a handful of TPU kernels with no FFI boundary.

A dynamics model here is just an object with:
- ``step(x, u) -> x_next``         single (unbatched) transition
- ``nx, nu, nq, dt`` attributes

Everything else (batching, Jacobians, trajectory linearization, rollout)
is derived generically below.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
StepFn = Callable[[Array, Array], Array]


# ---------------------------------------------------------------------------
# Integrators (reference: deqmpc/rexquad_utils.py:52-117 rk4/euler;
# deqmpc/envs.py:23-31 semi-implicit euler; CasADi packages bake midpoint/RK2
# into the generated expression graph)
# ---------------------------------------------------------------------------


def euler(ode: Callable[[Array, Array], Array], x: Array, u: Array, dt: float) -> Array:
    return x + dt * ode(x, u)


def midpoint(ode: Callable[[Array, Array], Array], x: Array, u: Array, dt: float) -> Array:
    k1 = ode(x, u)
    k2 = ode(x + 0.5 * dt * k1, u)
    return x + dt * k2


def rk4(ode: Callable[[Array, Array], Array], x: Array, u: Array, dt: float) -> Array:
    k1 = ode(x, u)
    k2 = ode(x + 0.5 * dt * k1, u)
    k3 = ode(x + 0.5 * dt * k2, u)
    k4 = ode(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def semi_implicit_euler(
    accel: Callable[[Array, Array], Array], x: Array, u: Array, dt: float, nq: int
) -> Array:
    """v' = v + a·dt ; q' = q + v'·dt  (structure-preserving for (q, v) states)."""
    q, v = x[..., :nq], x[..., nq:]
    v_n = v + accel(x, u) * dt
    q_n = q + v_n * dt
    return jnp.concatenate([q_n, v_n], axis=-1)


# ---------------------------------------------------------------------------
# Derived transforms
# ---------------------------------------------------------------------------


def batched_step(step: StepFn) -> StepFn:
    """[bsz, nx] × [bsz, nu] -> [bsz, nx]."""
    return jax.vmap(step)


def step_with_jac(step: StepFn) -> Callable[[Array, Array], Tuple[Array, Tuple[Array, Array]]]:
    """Batched (x_next, (J_x, J_u)) — the `*_jac` companion-module analog
    (reference: deqmpc/envs.py:68-82, my_envs/dynamics.py:67-108).

    Forward-mode is the right choice: nx+nu input dims are tiny, and the
    whole thing stays one fused XLA computation.
    """

    def single(x, u):
        jx = jax.jacfwd(step, argnums=0)(x, u)
        ju = jax.jacfwd(step, argnums=1)(x, u)
        return step(x, u), (jx, ju)

    return jax.vmap(single)


def linearize_trajectory(step: StepFn, x: Array, u: Array) -> Tuple[Array, Array, Array]:
    """Linearize dynamics along a trajectory: returns (x_next, A, B) with
    x_next: [bsz, T-1, nx], A: [bsz, T-1, nx, nx], B: [bsz, T-1, nx, nu].

    One batched call over all (batch × time) pairs — the reference's
    GradMethods.ANALYTIC path (qp_wrapper.py:481-596) flattened into a
    single vmap so XLA sees one big batch.
    """
    bsz, T, nx = x.shape
    nu = u.shape[-1]
    xf = x[:, :-1].reshape(-1, nx)
    uf = u[:, :-1].reshape(-1, nu)
    x_next, (A, B) = step_with_jac(step)(xf, uf)
    return (
        x_next.reshape(bsz, T - 1, nx),
        A.reshape(bsz, T - 1, nx, nx),
        B.reshape(bsz, T - 1, nx, nu),
    )


def rollout(step: StepFn, x0: Array, u: Array) -> Array:
    """Roll the batched dynamics forward: x0 [bsz, nx], u [bsz, T, nu]
    -> [bsz, T, nx] (x0 is the first row; u[:, T-1] is unused, matching
    qpth/AL_mpc.py:398-411 which rolls T-1 steps from x0).

    Sequential in T by nature — expressed as lax.scan so it stays on
    device as one compiled loop.
    """
    bstep = batched_step(step)

    def body(xt, ut):
        xn = bstep(xt, ut)
        return xn, xn

    _, xs = jax.lax.scan(body, x0, jnp.swapaxes(u[:, :-1], 0, 1))
    return jnp.concatenate([x0[:, None], jnp.swapaxes(xs, 0, 1)], axis=1)


def finite_diff_jac(step: StepFn, eps: float = 1e-5):
    """Central-difference Jacobians, batched — the validation harness the
    reference ships for its CasADi derivatives (my_envs/dynamics.py:110-247).
    Used in tests to cross-check jacfwd."""

    def single(x, u):
        nx, nu = x.shape[-1], u.shape[-1]
        ex = jnp.eye(nx, dtype=x.dtype) * eps
        eu = jnp.eye(nu, dtype=u.dtype) * eps
        jx = jax.vmap(lambda d: (step(x + d, u) - step(x - d, u)) / (2 * eps))(ex).T
        ju = jax.vmap(lambda d: (step(x, u + d) - step(x, u - d)) / (2 * eps))(eu).T
        return jx, ju

    return jax.vmap(single)


class DynamicsModel:
    """Thin convenience wrapper bundling a step fn with its metadata.

    Subclasses define ``nx, nu, nq, dt`` and ``step``; instances are static
    (hashable) so they can be closed over / passed as static args to jit.
    """

    nx: int
    nu: int
    nq: int
    dt: float

    def step(self, x: Array, u: Array) -> Array:  # pragma: no cover - abstract
        raise NotImplementedError

    def step_parts(self, xs, us):
        """Coordinate-wise step: tuples of same-shaped arrays in/out.

        Used by whole-solver Pallas kernels (ops/al_fused_pallas) where
        state coordinates live as separate (8,128) batch tiles — stacking
        them onto a minor axis would force catastrophic Mosaic padding.
        Models with elementwise closed-form steps override this; the
        default stacks (fine under XLA, unsuitable inside kernels).
        """
        x = jnp.stack(xs, axis=-1)
        u = jnp.stack(us, axis=-1)
        xn = self.step(x, u)
        return tuple(xn[..., i] for i in range(self.nx))

    # --- derived API ---
    def __call__(self, x: Array, u: Array) -> Array:
        """Batched step (matches reference forward(x[bsz,nx], u[bsz,nu]))."""
        return batched_step(self.step)(x, u)

    def jac(self, x: Array, u: Array):
        """Batched (x_next, (J_x, J_u))."""
        return step_with_jac(self.step)(x, u)

    def linearize(self, x: Array, u: Array):
        return linearize_trajectory(self.step, x, u)

    def rollout(self, x0: Array, u: Array) -> Array:
        return rollout(self.step, x0, u)

    def action_clip(self, u: Array) -> Array:
        return u

    def state_clip(self, x: Array) -> Array:
        return x

    # Static-hashability: models are config-only objects.
    def __hash__(self):
        return hash((type(self), self.nx, self.nu, self.dt))

    def __eq__(self, other):
        return type(self) is type(other) and hash(self) == hash(other)


class SlewAugmented(DynamicsModel):
    """State augmentation carrying the previous control: x̃ = [x; u_prev].

    This is the structured equivalent of the reference's SlewRateCost
    wrapper (qpth/qp_wrapper.py:30-57, slew_rate_penalty/prev_ctrl
    qp_wrapper.py:114-118,186-187): instead of bolting a cross-stage
    penalty onto the cost (which breaks the stage-separable structure the
    Riccati KKT kernels rely on), the previous control becomes part of the
    state — step̃([x, u_prev], u) = [f(x, u), u] — and the slew penalty
    s·‖u − u_prev‖² becomes an ordinary *stage* quadratic with an
    (u_prev, u) cross block, which QuadCost represents exactly.
    """

    def __init__(self, inner: "DynamicsModel"):
        self.inner = inner
        self.nx = inner.nx + inner.nu
        self.nu = inner.nu
        self.nq = inner.nq
        self.dt = inner.dt

    def step(self, x: Array, u: Array) -> Array:
        x_true = x[..., : self.inner.nx]
        return jnp.concatenate([self.inner.step(x_true, u), u], axis=-1)

    def __hash__(self):
        return hash((type(self), self.inner))


def angle_normalize(x: Array) -> Array:
    """Wrap to (-π, π] (reference: deqmpc/envs.py:56-57)."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def angle_normalize_2pi(x: Array) -> Array:
    """Wrap to [0, 2π) (reference: envs_v1.py angle_normalize_2pi, used by
    the cartpole state_clip — with upright at π this keeps the goal in the
    middle of the wrapped range)."""
    return x % (2 * jnp.pi)
