"""parallel.prefetch_to_device: staging batches ahead of the step must
preserve order/values exactly and apply the same placement shard_batch /
device_put would (it only changes WHEN transfers are issued, not what the
step sees)."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.parallel import (data_sharding, make_mesh,
                                   prefetch_to_device)


def _batches(n, seed=0):
    r = np.random.RandomState(seed)
    return [dict(x=r.randn(8, 3).astype(np.float32),
                 nested=dict(y=r.randint(0, 255, (8, 4, 4, 3),
                                         dtype=np.uint8)),
                 i=np.full((8,), k, np.int32)) for k in range(n)]


def test_prefetch_preserves_order_and_values_no_mesh():
    src = _batches(5)
    out = list(prefetch_to_device(iter(src), mesh=None, size=2))
    assert len(out) == 5
    for k, (a, b) in enumerate(zip(out, src)):
        assert isinstance(a["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])
        np.testing.assert_array_equal(np.asarray(a["nested"]["y"]),
                                      b["nested"]["y"])
        assert int(a["i"][0]) == k


def test_prefetch_mesh_places_batch_sharded():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    src = _batches(3, seed=1)
    out = list(prefetch_to_device(iter(src), mesh=mesh, size=2))
    assert len(out) == 3
    want = data_sharding(mesh)
    for a, b in zip(out, src):
        assert a["x"].sharding.is_equivalent_to(want, a["x"].ndim)
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])


def test_prefetch_size_zero_is_passthrough():
    src = _batches(2)
    out = list(prefetch_to_device(iter(src), mesh=None, size=0))
    assert out[0] is src[0] and out[1] is src[1]


def test_prefetch_size_zero_with_mesh_still_shards():
    """prefetch_batches=0 disables the lookahead, NOT the sharding: on a
    mesh the batch must still go through shard_batch (on pods that call is
    also the global-array assembly — skipping it would hand the step
    process-local numpy)."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    src = _batches(2, seed=2)
    out = list(prefetch_to_device(iter(src), mesh=mesh, size=0))
    assert len(out) == 2
    want = data_sharding(mesh)
    for a, b in zip(out, src):
        assert a["x"].sharding.is_equivalent_to(want, a["x"].ndim)
        np.testing.assert_array_equal(np.asarray(a["x"]), b["x"])


def test_prefetch_short_iterator_drains():
    # fewer batches than the prefetch depth: everything still comes out
    src = _batches(1)
    out = list(prefetch_to_device(iter(src), mesh=None, size=4))
    assert len(out) == 1
    np.testing.assert_array_equal(np.asarray(out[0]["x"]), src[0]["x"])


def test_prefetch_staging_is_bounded():
    """The generator stages at most size+1 batches ahead of consumption —
    it must not eagerly drain the whole loader."""
    pulled = []

    def gen():
        for k in range(10):
            pulled.append(k)
            yield dict(x=np.full((2,), k, np.float32))

    it = prefetch_to_device(gen(), mesh=None, size=2)
    first = next(it)
    assert int(first["x"][0]) == 0
    assert len(pulled) <= 4, f"eager staging: pulled {pulled}"
