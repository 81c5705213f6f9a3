from diff_qp_mpc_tpu.models.base import (
    DynamicsModel,
    angle_normalize,
    batched_step,
    euler,
    finite_diff_jac,
    linearize_trajectory,
    midpoint,
    rk4,
    rollout,
    semi_implicit_euler,
    step_with_jac,
)
from diff_qp_mpc_tpu.models.integrator import Integrator
from diff_qp_mpc_tpu.models.pendulum import Pendulum, PendulumCosSin
