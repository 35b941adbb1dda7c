"""Multi-host execution: 2 real processes, localhost coordinator.

Exercises the process_count > 1 branch of parallel/mesh.py:shard_host_batch
(jax.make_array_from_process_local_data) and cli/train.py's
jax.distributed.initialize path END TO END on the CPU backend -- the leg
SURVEY.md §5 calls for and the reference never had (its multi-GPU support
is one never-used comment, /root/reference/config/system.py:35).

Each worker process supplies 4 virtual CPU devices (8 global), contributes
its LOCAL half of an 8-image global batch, and runs one full data-parallel
train step (sync-BN + gradient all-reduce over Gloo). The parent asserts
both workers agree with a single-process single-device run of the same
global batch.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
pid, nproc, coord, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
import jax
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
from phiseg_tpu.engine import ExperimentConfig, build_model, create_train_state, make_train_step
from phiseg_tpu.engine.train import make_optimizer
from phiseg_tpu.parallel import make_mesh, shard_host_batch, shard_train_step

assert jax.process_count() == nproc, jax.process_count()
cfg = ExperimentConfig(model_family="phiseg", latent_levels=2,
                       resolution_levels=4, n0=2, zdim0=2,
                       image_size=(16, 16, 1), compute_dtype="float32",
                       batch_size=8)
mesh = make_mesh()  # all 8 GLOBAL devices
model = build_model(cfg)
tx = make_optimizer(cfg)
key = jax.random.PRNGKey(0)
# identical deterministic global batch in every process
x = np.asarray(jax.random.normal(key, (8, 16, 16, 1)))
s = np.asarray((jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32))
state = create_train_state(model, cfg, key, tx)
step = make_train_step(model, cfg, tx, donate=False)
step, state = shard_train_step(step, state, mesh)
# each process passes ONLY its local slice of the global batch
per = 8 // nproc
lo = pid * per
xg = shard_host_batch(x[lo:lo + per], mesh)
sg = shard_host_batch(s[lo:lo + per], mesh)
assert xg.shape == (8, 16, 16, 1), xg.shape  # global shape, local data
state, loss = step(state, xg, sg, key)
total = float(jax.device_get(loss["total_loss"]))
with open(out, "w") as f:
    f.write(repr(total))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    coord = f"localhost:{_free_port()}"

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    # strip the parent's device-count flag, then force 4 per process
    import re

    flags = re.sub(r"\s*--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    outs = [tmp_path / f"loss{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), "2", coord, str(outs[i])],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n\n".join(logs)

    losses = [float(o.read_text()) for o in outs]
    assert losses[0] == losses[1], losses  # same global program, same result

    # single-process single-device reference on the same global batch
    import jax.numpy as jnp

    from phiseg_tpu.engine import (
        ExperimentConfig,
        build_model,
        create_train_state,
        make_train_step,
    )
    from phiseg_tpu.engine.train import make_optimizer

    cfg = ExperimentConfig(model_family="phiseg", latent_levels=2,
                           resolution_levels=4, n0=2, zdim0=2,
                           image_size=(16, 16, 1), compute_dtype="float32",
                           batch_size=8)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16, 1))
    s = (jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32)
    state = create_train_state(model, cfg, key, tx)
    step = make_train_step(model, cfg, tx, donate=False)
    _, loss = step(state, x, s, key)
    ref = float(jax.device_get(loss["total_loss"]))
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)
