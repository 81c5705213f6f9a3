"""Worker for the 2-process jax.distributed CPU test (run by
tests/test_parallel.py::test_multiprocess_distributed_solve).

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh. The batch axis of an AL-MPC solve is sharded over all 8
devices across the process boundary; the psum'd mean dynamics residual and
the global control-solution norm must match the single-process truth
(written by the parent) to f32 tolerance.

Usage: python _distributed_worker.py <coordinator> <nproc> <pid> <outfile>
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator, nproc, pid, outfile = (sys.argv[1], int(sys.argv[2]),
                                        int(sys.argv[3]), sys.argv[4])
    from diff_qp_mpc_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=coordinator, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import diff_qp_mpc_tpu as dq
    from diff_qp_mpc_tpu.models import Pendulum
    from diff_qp_mpc_tpu.parallel import mesh as mesh_mod
    from diff_qp_mpc_tpu.solvers import al_mpc

    mesh = mesh_mod.make_mesh()  # all 8 global devices
    sh = NamedSharding(mesh, P(mesh_mod.DATA_AXIS))

    model = Pendulum()
    bsz, T, nx, nu = 32, 5, 2, 1
    n = nx + nu
    rng = np.random.RandomState(0)  # same global data in every process
    x0_np = np.concatenate([rng.uniform(-0.25, 0.25, (bsz, 1)),
                            rng.uniform(-0.5, 0.5, (bsz, 1))], axis=1)

    def global_arr(np_arr):
        return jax.make_array_from_callback(
            np_arr.shape, sh, lambda idx: jnp.asarray(np_arr[idx]))

    x0 = global_arr(x0_np)
    Cd = global_arr(np.broadcast_to([10.0, 0.1, 0.001], (bsz, T, n)).copy())
    c = global_arr(np.zeros((bsz, T, n)))
    bounds = dq.Bounds(u_lo=jnp.array([-3.0]), u_hi=jnp.array([3.0]))
    cfg = al_mpc.ALConfig(al_iter=2, n_newton=4, rho_max=1e4, reg=1e-7)

    @jax.jit
    def solve(x0, Cd, c):
        st = dq.ALState.init(bsz, T, nx, nu, dtype=x0.dtype)
        x, u, _, stats = al_mpc.solve(
            model, dq.DiagQuadCost(Cd=Cd, c=c), x0, bounds, st, cfg)
        return jnp.mean(stats.dyn_res), jnp.linalg.norm(u.reshape(-1))

    mean_res, u_norm = solve(x0, Cd, c)
    # fully-addressable scalars — identical in every process
    out = f"{float(mean_res):.12e} {float(u_norm):.12e}\n"
    if pid == 0:
        with open(outfile, "w") as f:
            f.write(out)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
