"""Learning stack: data sampler semantics, noise modes, DEQ nets,
DEQ-MPC policy forward/backward, and a short end-to-end training check
(the minimum slice of the reference's run.sh config)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diff_qp_mpc_tpu.envs import IntegratorEnv
from diff_qp_mpc_tpu.learning import data as data_mod
from diff_qp_mpc_tpu.learning import losses as losses_mod
from diff_qp_mpc_tpu.learning import noise as noise_mod
from diff_qp_mpc_tpu.learning.deq import DEQLayer, DEQPolicy, anderson
from diff_qp_mpc_tpu.learning.policies import DEQMPCPolicy, TrackingMPC
from diff_qp_mpc_tpu.solvers import al_mpc


# --------------------------------------------------------------------------
# data pipeline
# --------------------------------------------------------------------------


def tiny_dataset():
    # two trajectories of lengths 4 and 3
    trajs = [
        [(np.full(2, i, np.float32), np.full(1, i, np.float32)) for i in range(4)],
        [(np.full(2, 10 + i, np.float32), np.full(1, 10 + i, np.float32))
         for i in range(3)],
    ]
    return data_mod.merge_trajectories(trajs)


def test_merge_marks_episode_ends():
    d = tiny_dataset()
    np.testing.assert_array_equal(d["mask"], [1, 1, 1, 0, 1, 1, 0])
    assert d["state"].shape == (7, 2)


def test_sampler_masks_across_episode_boundary():
    d = tiny_dataset()
    rng = np.random.RandomState(0)
    batch = data_mod.sample_window_batch(d, bsz=32, T=3, rng=rng)
    assert batch["state"].shape == (32, 3, 2)
    # every window starts at a mask-1 step
    assert (batch["mask"][:, 0] == 1).all()
    # cumulative: once 0, stays 0
    m = batch["mask"]
    assert ((np.diff(m, axis=1) <= 0) | (m[:, 1:] == 1)).all()
    # windows starting at index 2 (state value 2) must mask step 2+
    starts = batch["state"][:, 0, 0]
    for b in range(32):
        if starts[b] == 2:  # window = [2, 3(end), 10] → mask [1, 0, 0]
            np.testing.assert_array_equal(m[b], [1, 0, 0])


# --------------------------------------------------------------------------
# noise
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 5, 6])
def test_noise_modes_shapes(mode):
    key = jax.random.PRNGKey(0)
    s = jnp.ones((4, 6, 3))
    out = noise_mod.corrupt_observation(key, s, mode, 0.1, 0.3)
    assert out.shape == s.shape
    if mode == 0:
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s))
    if mode in (3, 4):
        # dropped elements are exactly zero
        dropped = np.asarray(out) == 0.0
        assert dropped.any()
        if mode == 4:  # whole vectors dropped
            per_vec = dropped.all(axis=-1) | (~dropped).all(axis=-1)
            assert per_vec.all()


# --------------------------------------------------------------------------
# DEQ nets
# --------------------------------------------------------------------------


def test_anderson_finds_fixed_point():
    A = 0.5 * jnp.eye(4)
    b = jnp.ones((4,))

    def f(z):  # contraction z -> Az + b, fixed point (I-A)^-1 b = 2
        return z @ A + b

    z0 = jnp.zeros((3, 4))
    z, res = anderson(f, z0, max_iter=20)
    np.testing.assert_allclose(np.asarray(z), 2 * np.ones((3, 4)), rtol=1e-4)


def test_deq_layer_out_types():
    for out_type, shape in [(0, (2, 5, 1)), (1, (2, 4, 3)), (2, (2, 5, 3))]:
        layer = DEQLayer(nx=3, nu=1, nq=1, T=5, hdim=16, dt=0.1,
                         out_type=out_type)
        x = jnp.ones((2, 3))
        traj = jnp.zeros((2, layer.in_dim()))
        z = layer.init_z(2)
        params = layer.init(jax.random.PRNGKey(0), x, traj, z)
        out, z2 = layer.apply(params, x, traj, z)
        assert out.shape == shape, (out_type, out.shape)
        assert z2.shape == (2, 16)


def test_deq_policy_forward_and_grad():
    pol = DEQPolicy(nx=2, T=4, hdim=16, fwd_iter=10)
    x = jnp.ones((3, 2))
    params = pol.init(jax.random.PRNGKey(0), x)
    out = pol.apply(params, x)
    assert out.shape == (3, 4, 2)
    g = jax.grad(lambda p: jnp.sum(pol.apply(p, x) ** 2))(params)
    gnorm = optax.global_norm(g)
    assert float(gnorm) > 0 and np.isfinite(float(gnorm))


# --------------------------------------------------------------------------
# DEQ-MPC policy end-to-end
# --------------------------------------------------------------------------


def make_deqmpc(T=5, deq_iter=2, hdim=16, solver_type="al",
                ws_mode="proposal"):
    env = IntegratorEnv()
    tracking = TrackingMPC(
        model=env.model, T=T,
        Q=tuple(float(v) for v in np.asarray(env.Qlqr)),
        R=tuple(float(v) for v in np.asarray(env.Rlqr)),
        u_lo=tuple(float(v) for v in env.action_space.low),
        u_hi=tuple(float(v) for v in env.action_space.high),
        cfg=al_mpc.ALConfig(al_iter=2),
        solver_type=solver_type,
    )
    pol = DEQMPCPolicy(nx=2, nu=1, nq=1, T=T, hdim=hdim, dt=env.model.dt,
                       tracking=tracking, deq_iter=deq_iter, out_type=2,
                       ws_mode=ws_mode)
    return env, pol


def test_deqmpc_policy_shapes():
    env, pol = make_deqmpc()
    x = jnp.ones((4, 2))
    params = pol.init(jax.random.PRNGKey(0), x, qp_solve=False)
    iterates, dyn_res = pol.apply(params, x, qp_solve=True)
    assert len(iterates) == 2
    assert iterates[0].states.shape == (4, 5, 2)
    assert iterates[0].actions.shape == (4, 5, 1)
    assert np.isfinite(float(dyn_res))


def test_deqmpc_training_reduces_loss():
    """Short imitation run: loss must drop (mini version of the flagship
    run.sh config; the full loop is exercised by learning.train)."""
    env, pol = make_deqmpc(T=5, deq_iter=2, hdim=32)
    rng = np.random.RandomState(0)
    # synthetic "expert": drive to origin with a linear feedback
    xs, us = [], []
    x = jnp.asarray(rng.uniform(-1, 1, (64, 2)), jnp.float32)
    for _ in range(8):
        u = -0.8 * x[:, :1] - 0.5 * x[:, 1:]
        xs.append(np.asarray(x))
        us.append(np.asarray(u))
        x = env.model(x, u)
    states = jnp.asarray(np.stack(xs, 1))  # [64, 8, 2]
    actions = jnp.asarray(np.stack(us, 1))
    mask = jnp.ones((64, 8))

    params = pol.init(jax.random.PRNGKey(1), states[:, 0], qp_solve=False)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x0, gt_s, gt_a, m):
        def loss_fn(p):
            its, _ = pol.apply(p, x0, qp_solve=True)
            loss, _ = losses_mod.compute_loss_deqmpc(2, gt_s, gt_a, m, its)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state2 = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state2, loss

    losses = []
    for i in range(25):
        x0 = states[:, 0]
        loss = None
        params, opt_state, loss = step(params, opt_state, x0,
                                       states[:, :5], actions[:, :5], mask[:, :5])
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


@pytest.mark.parametrize("solver_type", ["al", "ip"])
def test_deqmpc_tracking_backends_train_one_step(solver_type):
    """Both Tracking_MPC backends (reference policies.py:605-662:
    solver_type 'al' → AL_mpc, 'ip' → qp_wrapper SQP) must run a training
    step with finite loss and nonzero gradients."""
    env, pol = make_deqmpc(T=5, deq_iter=2, hdim=16, solver_type=solver_type)
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (8, 2)), jnp.float32)
    params = pol.init(jax.random.PRNGKey(0), x, qp_solve=False)

    gt_s = jnp.zeros((8, 5, 2))
    gt_a = jnp.zeros((8, 5, 1))
    m = jnp.ones((8, 5))

    @jax.jit
    def loss_fn(p):
        its, dyn_res = pol.apply(p, x, qp_solve=True)
        loss, _ = losses_mod.compute_loss_deqmpc(2, gt_s, gt_a, m, its)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(g)) > 0


def test_deqmpc_ip_fused_kernel_trains_one_step():
    """Regression: `--solver_type ip --fused` crashed at the
    pretrain→deqmpc transition in EVERY run through r4
    (TracerArrayConversionError: TrackingMPC's ip branch passed device
    bounds into the fused trajectory-QP kernel, which bakes the box as
    static clip constants). The fused kernel runs in Pallas interpret
    mode here so the trace+execute path is covered on CPU."""
    from diff_qp_mpc_tpu.solvers.sqp_mpc import SQPConfig
    from diff_qp_mpc_tpu.solvers.trajqp import TrajQPConfig

    env = IntegratorEnv()
    tracking = TrackingMPC(
        model=env.model, T=5,
        Q=tuple(float(v) for v in np.asarray(env.Qlqr)),
        R=tuple(float(v) for v in np.asarray(env.Rlqr)),
        u_lo=tuple(float(v) for v in env.action_space.low),
        u_hi=tuple(float(v) for v in env.action_space.high),
        cfg=al_mpc.ALConfig(al_iter=2),
        solver_type="ip",
        sqp_cfg=SQPConfig(
            qp_iter=2, qp=TrajQPConfig(kernel="fused", interpret=True)),
        use_fused=True,
    )
    pol = DEQMPCPolicy(nx=2, nu=1, nq=1, T=5, hdim=16, dt=env.model.dt,
                       tracking=tracking, deq_iter=2, out_type=2)
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (4, 2)),
                    jnp.float32)
    params = pol.init(jax.random.PRNGKey(0), x, qp_solve=False)
    gt_s = jnp.zeros((4, 5, 2))
    gt_a = jnp.zeros((4, 5, 1))
    m = jnp.ones((4, 5))

    @jax.jit
    def loss_fn(p):
        its, _ = pol.apply(p, x, qp_solve=True)
        loss, _ = losses_mod.compute_loss_deqmpc(2, gt_s, gt_a, m, its)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(g)) > 0


def test_deq_conv_layer_variant():
    """Temporal-conv cell (reference layer_type='gcn')."""
    layer = DEQLayer(nx=3, nu=1, nq=1, T=5, hdim=16, dt=0.1, out_type=2,
                     layer_type="conv")
    x = jnp.ones((2, 3))
    traj = jnp.zeros((2, layer.in_dim()))
    z = layer.init_z(2)
    assert z.shape == (2, 5, 16)
    params = layer.init(jax.random.PRNGKey(0), x, traj, z)
    out, z2 = layer.apply(params, x, traj, z)
    assert out.shape == (2, 5, 3)
    assert z2.shape == (2, 5, 16)
    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x, traj, z)[0] ** 2))(params)
    assert float(optax.global_norm(g)) > 0


def test_deqmpc_ws_mode_solution():
    """Reference-exact warm-start semantics (policies.py:647-667 in the
    reference): in 'solution' mode the tracker refines its previous
    solution across DEQ iterations. Must run, be finite, differ from
    'proposal' mode after the first iterate, and leave the first iterate
    identical (both modes seed it from the proposal)."""
    env, pol_prop = make_deqmpc(deq_iter=3)
    _, pol_sol = make_deqmpc(deq_iter=3, ws_mode="solution")
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (4, 2)),
                    jnp.float32)
    params = pol_prop.init(jax.random.PRNGKey(0), x, qp_solve=False)
    it_p, res_p = pol_prop.apply(params, x, qp_solve=True)
    it_s, res_s = pol_sol.apply(params, x, qp_solve=True)
    assert np.isfinite(float(res_s))
    np.testing.assert_allclose(np.asarray(it_p[0].states),
                               np.asarray(it_s[0].states), atol=1e-6)
    assert not np.allclose(np.asarray(it_p[-1].states),
                           np.asarray(it_s[-1].states), atol=1e-6)


def test_reference_torch_checkpoint_adapter():
    """Load the reference's shipped torch policy checkpoint
    (deqmpc/model/bc_sac_pen, a DEQMPCPolicy state dict saved by its
    train.py:196) into our flax DEQLayer and match the torch forward
    (replicated with torch.nn.functional from the raw state dict) to a few
    1e-4 — exercising the state-dict→flax mapping including the
    construction-order LayerNorm naming subtlety."""
    torch = pytest.importorskip("torch")
    import os

    path = "/root/reference/deqmpc/model/bc_sac_pen"
    if not os.path.exists(path):
        pytest.skip("reference checkpoint not available")
    from diff_qp_mpc_tpu.learning.data import load_reference_torch_policy

    params = load_reference_torch_policy(path)
    layer = DEQLayer(nx=2, nu=1, nq=1, T=5, hdim=128, dt=0.05, out_type=1,
                     layer_type="mlp")
    rng = np.random.RandomState(0)
    x = rng.randn(4, 2).astype(np.float32)
    traj = rng.randn(4, 10).astype(np.float32)
    traj[:, :2] = x
    z = rng.randn(4, 128).astype(np.float32)
    x_ref, z_out = layer.apply({"params": params["params"]["DEQLayer_0"]},
                               jnp.asarray(x), jnp.asarray(traj),
                               jnp.asarray(z))

    sd = torch.load(path, map_location="cpu", weights_only=False)
    tx, tz = torch.tensor(traj), torch.tensor(z)
    lin = lambda p, v: torch.nn.functional.linear(
        v, sd[p + ".weight"], sd[p + ".bias"])
    lnf = lambda p, v: torch.nn.functional.layer_norm(
        v, (128,), sd[p + ".weight"], sd[p + ".bias"])
    xi = lnf("model.inp_layer.1", lin("model.inp_layer.0", tx))
    zz = lnf("model.lndeq1", torch.relu(lin("model.fcdeq1", tz)))
    zo = lnf("model.lndeq3", torch.relu(
        zz + lnf("model.lndeq2", xi + lin("model.fcdeq2", zz))))
    out = lin("model.out_layer.0", zo)
    d = out.view(-1, 4, 2)
    x_ref_t = torch.cat([d[..., :1] * 0.05 + tx[:, None, :1], d[..., 1:]], -1)
    np.testing.assert_allclose(np.asarray(z_out), zo.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_ref), x_ref_t.numpy(), atol=2e-4)


def test_train_cli_rho_budget_flags_reach_solver():
    """--rho_max/--al_reg plumb through make_policy into the tracker's
    ALConfig, and evaluate adopts them from a checkpoint's meta (the f32
    budget fix: carried rho at 1e6 over the DEQ iterations puts cond(H)
    past f32 range and the quadrotor's tracking solves return their
    infeasible proposal inits — measured dyn_res ~0.1 vs 2.5e-6 with
    rho_max 1e4, probe r4)."""
    from diff_qp_mpc_tpu.learning.train import build_parser, make_policy
    from diff_qp_mpc_tpu.envs import make_env

    args = build_parser().parse_args(
        ["--env", "integrator", "--deq", "--rho_max", "1e4",
         "--al_reg", "1e-6"])
    env = make_env("integrator")
    pol = make_policy(args, env)
    assert pol.tracking.cfg.rho_max == 1e4
    assert pol.tracking.cfg.reg == 1e-6
    # defaults stay at ALConfig's values when the flags are omitted
    args2 = build_parser().parse_args(["--env", "integrator", "--deq"])
    pol2 = make_policy(args2, env)
    assert pol2.tracking.cfg.rho_max == al_mpc.ALConfig().rho_max
    assert pol2.tracking.cfg.reg == al_mpc.ALConfig().reg
