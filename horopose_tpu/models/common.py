"""Shared model utilities: BatchNorm with freeze support.

The sim2real stage trains with BatchNorm FROZEN (running statistics) while
dropout stays live (reference: train_sim2real.py:144-148 sets m.eval() on
every BN module after model.train()). `frozen_batchnorm()` is a trace-time
context: any BatchNorm constructed while it is active uses running averages
regardless of the `train` flag. Because Flax modules build their graph at
trace time, wrapping the jit'd step construction in the context bakes the
frozen behavior into the compiled program.
"""

from __future__ import annotations

import contextlib
import contextvars

import flax.linen as nn
import jax.numpy as jnp

_BN_FROZEN = contextvars.ContextVar("horopose_bn_frozen", default=False)


@contextlib.contextmanager
def frozen_batchnorm():
    token = _BN_FROZEN.set(True)
    try:
        yield
    finally:
        _BN_FROZEN.reset(token)


def bn_frozen() -> bool:
    return _BN_FROZEN.get()


def batch_norm(train: bool, dtype=jnp.float32, name=None,
               momentum: float = 0.9) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=(not train) or _BN_FROZEN.get(),
        momentum=momentum, dtype=dtype, name=name)
