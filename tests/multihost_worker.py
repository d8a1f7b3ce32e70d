"""Subprocess worker for the 2-process multi-host DP smoke test.

Run as ``python multihost_worker.py <process_id> <port>`` — see
``test_parallel.py::test_multihost_data_parallel_train_step``.  Each process
owns 4 virtual CPU devices (8 global), holds only ITS half of the global
batch, and feeds it through :func:`focalnet_tpu.parallel.make_global_batch`
(the ``jax.make_array_from_process_local_data`` branch that was labeled
UNTESTED until this test; VERDICT r3 missing #4) into one real DP train
step.  Prints ``MHLOSS <loss>`` for the parent to compare against the
single-process step on identical data.
"""

import os
import sys


def main(pid: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # no persistent cache: two fresh processes racing XLA:CPU AOT cache
    # writes is exactly the put/get crash class documented in conftest.py
    os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    from focalnet_tpu.models import build_net
    from focalnet_tpu.parallel import make_global_batch, make_mesh
    from focalnet_tpu.train import make_train_step
    from focalnet_tpu.train.trainer import make_optimizer
    from focalnet_tpu.configs import TrainConfig

    model = build_net("1mlp_g2", vssg_dim=16, ssm_d_state=4,
                      scan_backend="chunked", drop_path_rate=0.0)
    tx = make_optimizer(TrainConfig(grad_clip=1.0, learning_rate=1e-3))
    rng = jax.random.PRNGKey(0)

    # identical data on every process, derived host-side; each process
    # passes only ITS half to make_global_batch
    rs = np.random.RandomState(0)
    hazy = rs.uniform(size=(8, 16, 16, 3)).astype(np.float32)
    gt = np.clip(hazy * 1.1 - 0.02, 0.0, 1.0).astype(np.float32)

    params = model.init({"params": rng}, hazy[:1])
    opt_state = tx.init(params)

    mesh = make_mesh(axes=("data",))  # all 8 GLOBAL devices
    local = (hazy[pid * 4 : (pid + 1) * 4], gt[pid * 4 : (pid + 1) * 4])
    hazy_g, gt_g = make_global_batch(local, mesh)
    assert hazy_g.shape == (8, 16, 16, 3), hazy_g.shape

    # params/opt_state stay uncommitted host pytrees: multi-process jit
    # treats them as replicated (identical on every process by construction)
    step = make_train_step(model, tx, fft_weight=0.1)
    _, _, metrics = step(params, opt_state, hazy_g, gt_g, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"MHLOSS {loss:.10f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
