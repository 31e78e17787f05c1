"""Subprocess body for tests/test_multihost.py — NOT a pytest module.

One of N coordinated processes: 4 local virtual CPU devices each, a real
jax.distributed coordinator over localhost, the tiny FullNet train step
from test_sharding_equivalence jitted over the 4N-device GLOBAL mesh, fed
through the production multihost path (local shard -> shard_batch ->
make_array_from_process_local_data). Prints one JSON result line.
"""

import json
import os
import sys

rank = int(sys.argv[1])
count = int(sys.argv[2])
port = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "train"
local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                           f"{local_devices}")
os.environ["HOROPOSE_COORDINATOR"] = f"localhost:{port}"
os.environ["HOROPOSE_NUM_PROCESSES"] = str(count)
os.environ["HOROPOSE_PROCESS_ID"] = str(rank)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))

from horopose_tpu.parallel import (DistributedSampler,  # noqa: E402
                                   local_batch_size, make_mesh,
                                   maybe_initialize, replicate, shard_batch,
                                   to_host)

assert maybe_initialize(), "env knobs set, initialize must fire"
assert jax.process_count() == count, jax.process_count()
assert jax.process_index() == rank, jax.process_index()
assert len(jax.local_devices()) == local_devices
assert len(jax.devices()) == local_devices * count

import numpy as np  # noqa: E402

if mode == "light":
    # no model, no heavy compile: verify global-batch ASSEMBLY ORDER —
    # per-rank contiguous rows must land at [rank*lb, (rank+1)*lb) of the
    # global array — plus a global jitted reduction and the to_host
    # allgather, on whatever (count x local_devices) topology the parent
    # chose
    mesh = make_mesh()
    B = len(jax.devices())
    lb = local_batch_size(B)
    local = (rank * lb + np.arange(lb)).astype(np.float32).reshape(lb, 1)
    g = shard_batch({"x": local}, mesh)["x"]
    assert g.shape == (B, 1), g.shape
    total = float(jax.jit(lambda a: a.sum())(g))
    gathered = to_host(g)[:, 0].tolist()
    print(json.dumps(dict(rank=rank, total=total, gathered=gathered)))
    sys.exit(0)
from test_sharding_equivalence import _fake_batch, _setup  # noqa: E402

from horopose_tpu.data.samplers import ListSampler  # noqa: E402

cfg, robot, state, step, size = _setup()

B = 8
batch_np = _fake_batch(B, size, robot.num_keypoints, robot.dof)
lb = local_batch_size(B)
lo = rank * lb
# contiguous per-process rows: global mesh device order is process-major,
# so this reassembles exactly the single-process global batch
local = jax.tree.map(lambda x: x[lo:lo + lb], batch_np)

mesh = make_mesh()
state = state.replace(step=replicate(state.step, mesh),
                      params=replicate(state.params, mesh),
                      batch_stats=replicate(state.batch_stats, mesh),
                      opt_state=replicate(state.opt_state, mesh))
gbatch = shard_batch(local, mesh)
assert gbatch["jointpose"].shape[0] == B, gbatch["jointpose"].shape

# to_host allgather: the sharded global batch reassembles to the full
# batch on every process
gathered = to_host(gbatch["jointpose"])
gather_ok = bool(np.allclose(gathered, batch_np["jointpose"]))

rng_ = jax.random.PRNGKey(1)
losses = []
for _ in range(2):
    state, logs = step(state, gbatch, rng_)
    losses.append(float(logs["loss"]))

leaves = jax.tree.leaves(state.params)[:10]
param_means = [float(np.mean(np.asarray(x))) for x in leaves]

sampler_ids = list(DistributedSampler(ListSampler(range(10))))

print(json.dumps(dict(rank=rank, losses=losses, param_means=param_means,
                      gather_ok=gather_ok, sampler_ids=sampler_ids)))
