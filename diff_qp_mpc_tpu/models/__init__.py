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
from diff_qp_mpc_tpu.models.cartpole import Cartpole1L, Cartpole2L, CartpoleCosSin
from diff_qp_mpc_tpu.models.lagrangian import lagrangian_ode, manipulator_accel
from diff_qp_mpc_tpu.models.quadrotor import RexQuadrotor
from diff_qp_mpc_tpu.models import rotation
