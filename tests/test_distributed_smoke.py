"""Two-process `jax.distributed` smoke (round-2 VERDICT item 5): the DCN
claim in parallel/mesh.py — "multi-host needs only jax.distributed.initialize
plus the same program" — executed for real. Two CPU processes x 2 local
devices form a 4-device global mesh; each process contributes its local shard
of the batch and runs ONE full training step of the actual flagship model
(forward + losses + grads + AdamW + EMA fold) with Gloo collectives crossing
the process boundary. Both processes must report the same finite loss."""

import os
import socket
import subprocess
import sys

import pytest

CHILD = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.device_count() == 4 and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, r"%(repo)s")
from bridgerl_tpu.config import make_experiment
from bridgerl_tpu.models import init_model
from bridgerl_tpu.parallel import make_mesh
from bridgerl_tpu.train import TrainState, make_optimizer, make_train_epoch, split_variables

mesh = make_mesh(jax.devices())
repl = NamedSharding(mesh, P())
data_sh = NamedSharding(mesh, P("data", None, None))

exp = make_experiment("transformer", "hybrid", window=10, mode="teacher",
                      hidden_dim=16, codebook_size=32, d_model=32, ff_dim=64,
                      n_tf_layers=1, batch_size=16)
model, template = init_model(exp.model, jax.random.key(0))
tx = make_optimizer(exp, template["params"])

# Replicated globals cannot be device_put from host values in multi-process
# mode (non-addressable sharding); build them INSIDE one jitted program with
# replicated out_shardings — every process computes the same values.
def build():
    _, variables = init_model(exp.model, jax.random.key(0))
    params, rest = split_variables(variables)
    state = TrainState(params, rest, tx.init(params))
    return state, jnp.arange(16).reshape(1, 16), jax.random.split(jax.random.key(3), 1)

state, idx, keys = jax.jit(build, out_shardings=repl)()

# each process owns half the global batch
rng = np.random.default_rng(123)
robot_all = rng.normal(size=(16, 10, 29)).astype(np.float32)
human_all = rng.normal(size=(16, 10, 126)).astype(np.float32)
lo, hi = pid * 8, (pid + 1) * 8
robot = jax.make_array_from_process_local_data(data_sh, robot_all[lo:hi], global_shape=(16, 10, 29))
human = jax.make_array_from_process_local_data(data_sh, human_all[lo:hi], global_shape=(16, 10, 126))

train_epoch = make_train_epoch(model, tx, exp, mesh)
state, logs = train_epoch(state, robot, human, idx, keys)
loss = float(logs["train_loss"])
assert np.isfinite(loss)
print(f"DCN_SMOKE proc{pid} loss={loss:.6f}", flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_dcn_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "dist_child.py"
    script.write_text(CHILD % {"repo": repo})
    port = _free_port()

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("DCN_SMOKE")]
        assert lines, f"no smoke line in:\n{out[-2000:]}"
        losses.append(float(lines[0].split("loss=")[1]))
    # the loss is a global scalar: both processes must agree exactly
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
