"""Multi-host data parallelism (parallel/multihost.py).

Unit layer: DistributedSampler slicing/padding, local_batch_size, the
train_mesh policy, and main-process gating of writers/checkpoints.

Integration layer: a REAL 2-process jax.distributed run over a localhost
coordinator (4 virtual CPU devices per process = 8 global), executing the
same tiny FullNet train step as test_sharding_equivalence through the
production path (DistributedSampler share -> shard_batch ->
make_array_from_process_local_data -> jitted global step), then compared
against the single-process 8-device result computed in this parent.

The reference has no multi-host story at all (its ceiling is one-process
DataParallel, /root/reference/lib/core/function.py:100-102); this is the
TPU-pod scaling seam of SURVEY.md section 5.8.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from horopose_tpu.data.samplers import ListSampler
from horopose_tpu.parallel.multihost import (DistributedSampler,
                                             local_batch_size)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_distributed_sampler_partitions_disjoint_and_complete():
    base = ListSampler(list(range(17)))
    parts = [list(DistributedSampler(base, rank=r, count=4)) for r in
             range(4)]
    # equal per-rank lengths (collective alignment), matching __len__
    assert all(len(p) == 17 // 4 == len(
        DistributedSampler(base, rank=r, count=4))
        for r, p in enumerate(parts))
    flat = [i for p in parts for i in p]
    assert len(set(flat)) == len(flat), "ranks must not overlap"
    assert set(flat) == set(range(16)), "first count*floor(n/count) covered"


def test_distributed_sampler_pad_wraps_instead_of_dropping():
    base = ListSampler(list(range(10)))
    parts = [list(DistributedSampler(base, rank=r, count=4, pad=True))
             for r in range(4)]
    assert all(len(p) == 3 for p in parts)
    flat = [i for p in parts for i in p]
    assert set(flat) == set(range(10)), "padding must not drop samples"
    assert len(flat) == 12, "wrap-around duplicates fill the tail"


def test_distributed_sampler_pad_tiny_base_fills_every_rank():
    """len(base) < total/2 (a 3-sample eval set on 8 processes): the pad
    must REPEAT the epoch so every rank still yields exactly len(self)
    indices — a short rank would deadlock the validate loops' allgather
    collectives on a pod (round-4 advisor finding)."""
    base = ListSampler([10, 11, 12])
    parts = [list(DistributedSampler(base, rank=r, count=8, pad=True))
             for r in range(8)]
    assert all(len(p) == 1 for p in parts), parts
    flat = [i for p in parts for i in p]
    assert set(flat) == {10, 11, 12}, "every sample still evaluated"
    # deterministic repetition order: epoch repeated then truncated
    assert flat == [10, 11, 12, 10, 11, 12, 10, 11]
    # empty base stays a no-op (no ZeroDivisionError, no indices)
    assert list(DistributedSampler(ListSampler([]), rank=0, count=8,
                                   pad=True)) == []


def test_distributed_sampler_reshuffles_with_base():
    """Per-epoch reshuffling of the base sampler flows through the view."""
    class TwoEpoch:
        def __init__(self):
            self.calls = 0

        def __len__(self):
            return 8

        def __iter__(self):
            self.calls += 1
            return iter(np.roll(np.arange(8), self.calls).tolist())

    base = TwoEpoch()
    ds = DistributedSampler(base, rank=0, count=2)
    assert list(ds) != list(ds), "second epoch must see the new permutation"


def test_local_batch_size_single_process_and_divisibility():
    assert local_batch_size(64) == 64  # single-process run
    with pytest.raises(ValueError):
        DistributedSampler(ListSampler([1]), rank=5, count=2)


def test_train_mesh_policy():
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.parallel import train_mesh
    cfg = make_default_cfg()
    cfg.mesh_shape = None
    assert train_mesh(cfg) is None  # single-process, no knob -> plain jit
    cfg.mesh_shape = [8]
    assert train_mesh(cfg).devices.size == 8


def test_train_mesh_rejects_indivisible_batch():
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.parallel import train_mesh
    cfg = make_default_cfg()
    cfg.mesh_shape = [8]
    cfg.batch_size = 12  # 12 % 8 != 0
    with pytest.raises(ValueError, match="divide evenly"):
        train_mesh(cfg)


def test_train_mesh_rejects_partial_pod_mesh(monkeypatch):
    """A stale single-host mesh_shape reused on a pod must fail fast:
    excluded ranks crash opaquely while included ranks silently train on a
    fraction of each batch."""
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.parallel import train_mesh
    monkeypatch.setattr("jax.process_count", lambda: 2)
    cfg = make_default_cfg()
    cfg.mesh_shape = [2]  # 2 of the 8 global devices
    with pytest.raises(ValueError, match="covers 2 of 8"):
        train_mesh(cfg)


def test_null_writer_gating(tmp_path, monkeypatch):
    """Non-main processes must not write logs or config copies."""
    import horopose_tpu.core.loggers as loggers
    from horopose_tpu.config import make_default_cfg
    cfg = make_default_cfg()
    cfg.exp_name = "gating_probe"
    monkeypatch.setattr("jax.process_index", lambda: 1)
    _, _, log_folder, writer = loggers.create_logger(
        cfg, exp_root=str(tmp_path))
    assert isinstance(writer, loggers.NullWriter)
    writer.add_scalar("x", 1.0, 0)
    writer.close()
    assert not os.path.exists(log_folder), "non-main must not create logs"


def test_maybe_initialize_env_modes(monkeypatch):
    """Explicit coordinator env -> initialize(addr, N, i); auto mode ->
    bare initialize(); no env -> no-op returning False."""
    from horopose_tpu.parallel.multihost import maybe_initialize
    calls = []
    monkeypatch.setattr("jax.distributed.initialize",
                        lambda *a, **kw: calls.append((a, kw)))
    for var in ("HOROPOSE_COORDINATOR", "HOROPOSE_NUM_PROCESSES",
                "HOROPOSE_PROCESS_ID", "HOROPOSE_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize(verbose=False) is False and not calls

    monkeypatch.setenv("HOROPOSE_COORDINATOR", "node0:1234")
    monkeypatch.setenv("HOROPOSE_NUM_PROCESSES", "4")
    monkeypatch.setenv("HOROPOSE_PROCESS_ID", "2")
    assert maybe_initialize(verbose=False) is True
    assert calls.pop() == ((), dict(coordinator_address="node0:1234",
                                    num_processes=4, process_id=2))

    monkeypatch.delenv("HOROPOSE_COORDINATOR")
    monkeypatch.setenv("HOROPOSE_DISTRIBUTED", "auto")
    assert maybe_initialize(verbose=False) is True
    assert calls.pop() == ((), {})


def test_maybe_initialize_names_missing_env_vars(monkeypatch):
    """Coordinator set without its companions must raise a ValueError that
    NAMES the missing variable(s), not an opaque KeyError (round-4 advisor
    finding)."""
    from horopose_tpu.parallel.multihost import maybe_initialize
    monkeypatch.setattr("jax.distributed.initialize",
                        lambda *a, **kw: None)
    monkeypatch.setenv("HOROPOSE_COORDINATOR", "node0:1234")
    for var in ("HOROPOSE_NUM_PROCESSES", "HOROPOSE_PROCESS_ID",
                "HOROPOSE_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError) as ei:
        maybe_initialize(verbose=False)
    assert "HOROPOSE_NUM_PROCESSES" in str(ei.value)
    assert "HOROPOSE_PROCESS_ID" in str(ei.value)

    monkeypatch.setenv("HOROPOSE_NUM_PROCESSES", "4")
    with pytest.raises(ValueError) as ei:
        maybe_initialize(verbose=False)
    assert "HOROPOSE_PROCESS_ID" in str(ei.value)
    assert "HOROPOSE_NUM_PROCESSES" not in str(ei.value)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")
           and not k.startswith("HOROPOSE_")}
    env["PYTHONUNBUFFERED"] = "1"
    return env


def test_four_process_global_batch_assembly():
    """4 processes x 2 devices: shard_batch's per-rank contiguous rows must
    land at [rank*lb, (rank+1)*lb) of the global array, the jitted global
    reduction must see every row, and to_host must allgather identically on
    every rank. Light worker mode — no model, runs in seconds."""
    port = _free_port()
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), "4", str(port), "light", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_worker_env(), cwd=REPO) for r in range(4)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for o in outs:
        assert o["gathered"] == [float(i) for i in range(8)], o
        assert o["total"] == float(sum(range(8))), o


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")
           and not k.startswith("HOROPOSE_")}
    env["PYTHONUNBUFFERED"] = "1"
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(r), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO) for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = sorted(outs, key=lambda d: d["rank"])
    # both processes observe identical global results
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["param_means"], r1["param_means"],
                               rtol=1e-6)
    assert r0["gather_ok"] and r1["gather_ok"]
    # the DistributedSampler ranks partition the epoch
    assert not set(r0["sampler_ids"]) & set(r1["sampler_ids"])
    assert set(r0["sampler_ids"]) | set(r1["sampler_ids"]) == set(range(10))

    # single-process 8-device reference (this pytest process): same seeds,
    # same batch, same two steps
    import jax
    from horopose_tpu.parallel import make_mesh, replicate, shard_batch
    from test_sharding_equivalence import _fake_batch, _setup
    cfg, robot, state, step, size = _setup()
    batch_np = _fake_batch(8, size, robot.num_keypoints, robot.dof)
    mesh = make_mesh(8)
    state = state.replace(step=replicate(state.step, mesh),
                          params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    gbatch = shard_batch(batch_np, mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(2):
        state, logs = step(state, gbatch, rng)
        losses.append(float(logs["loss"]))
    param_means = [float(np.mean(np.asarray(x)))
                   for x in jax.tree.leaves(state.params)[:10]]

    np.testing.assert_allclose(r0["losses"], losses, rtol=1e-4)
    np.testing.assert_allclose(r0["param_means"], param_means, rtol=1e-4,
                               atol=2e-5)
