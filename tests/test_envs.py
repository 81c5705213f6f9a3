"""Environment layer: pure functional reset/step, success/done logic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.envs import (
    Cartpole1LEnv,
    Cartpole2LEnv,
    IntegratorEnv,
    PendulumEnv,
    QuadrotorEnv,
    make_env,
)

ENVS = [PendulumEnv(), IntegratorEnv(), Cartpole1LEnv(), Cartpole2LEnv(),
        QuadrotorEnv()]


@pytest.mark.parametrize("env", ENVS, ids=lambda e: e.spec_id)
def test_reset_step_shapes(env):
    bsz = 6
    key = jax.random.PRNGKey(0)
    state = env.reset(key, bsz)
    assert state.x.shape == (bsz, env.nx)
    u = jnp.zeros((bsz, env.nu))
    state2, reward, done = env.step(state, u)
    assert state2.x.shape == (bsz, env.nx)
    assert reward.shape == (bsz,)
    assert done.shape == (bsz,)
    assert not bool(jnp.isnan(state2.x).any())
    assert int(state2.steps[0]) == 1


@pytest.mark.parametrize("env", ENVS, ids=lambda e: e.spec_id)
def test_step_jits(env):
    bsz = 4
    state = env.reset(jax.random.PRNGKey(1), bsz)
    u = jnp.zeros((bsz, env.nu))
    step = jax.jit(env.step)
    s1, r1, d1 = step(state, u)
    s2, r2, d2 = env.step(state, u)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), rtol=1e-6)


def test_done_on_max_steps():
    env = IntegratorEnv()
    env2 = make_env("integrator")
    assert env2.spec_id == env.spec_id
    bsz = 2
    state = env.reset(jax.random.PRNGKey(2), bsz)
    u = jnp.zeros((bsz, env.nu))
    for _ in range(env.max_steps):
        state, _, done = env.step(state, u)
    assert bool(done.all())


def test_success_streak_pendulum():
    env = PendulumEnv(stabilization=True)
    bsz = 3
    # place exactly at upright: success counter should accumulate
    state = env.reset(jax.random.PRNGKey(3), bsz)
    state = type(state)(x=jnp.zeros((bsz, 2)),
                        num_successes=state.num_successes, steps=state.steps)
    u = jnp.zeros((bsz, 1))
    done = None
    for _ in range(env.success_streak):
        state, _, done = env.step(state, u)
    assert bool(done.all())


def test_reset_where():
    env = IntegratorEnv()
    bsz = 4
    state = env.reset(jax.random.PRNGKey(4), bsz)
    mask = jnp.array([True, False, True, False])
    state2 = env.reset_where(jax.random.PRNGKey(5), state, mask)
    same = np.isclose(np.asarray(state2.x), np.asarray(state.x)).all(axis=-1)
    np.testing.assert_array_equal(same, [False, True, False, True])


def test_cartpole2l_wrap_branch_is_seam_free_at_goal():
    """Round-5 regression: the reference wraps BOTH joints to [0, 2π)
    (my_envs/cartpole.py:89-90), putting the both-links-up goal's
    θ₂ ≡ 0 exactly on the branch seam — a θ₂ = −0.02 read as 6.26 by
    any quadratic tracking cost, which then plans a full-circle
    'correction' (this single seam destabilized every closed-loop cp2
    rollout through env.step while the same solver stepping the raw
    model held 64/64). Our branch centers θ₂ on its goal: θ₂ ∈ [−π, π),
    θ₁ keeps [0, 2π) (its goal π is mid-branch)."""
    from diff_qp_mpc_tpu.models import Cartpole2L

    m = Cartpole2L.pkg()
    x = jnp.zeros((1, 6))
    x = x.at[0, 1].set(-0.10)   # θ₁ slightly negative → wraps up
    x = x.at[0, 2].set(-0.02)   # θ₂ slightly negative → must STAY near 0
    y = m.state_clip(x)
    assert abs(float(y[0, 1]) - (2 * np.pi - 0.10)) < 1e-6
    assert abs(float(y[0, 2]) - (-0.02)) < 1e-6
    # both wraps are the same circle quotient: physical angles unchanged
    np.testing.assert_allclose(np.sin(np.asarray(y[0, 1:3])),
                               np.sin(np.asarray(x[0, 1:3])), atol=1e-6)
