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


def chained_seconds(step, carry0, *args, iters: int = 10,
                    passes: int = 1) -> float:
    """Seconds per iteration of `step(carry, *args) -> carry`, timed
    honestly on remote-attached backends: the canonical harness behind
    bench.py, measure_forward_fps and every bench_*.py script.

    `iters` iterations run chained inside ONE jitted lax.scan — each
    iteration's input must depend on the previous output through `step`'s
    carry, which stops XLA from reordering, eliding, or hoisting the
    loop-invariant work out of the scan — synchronized by a host transfer
    of the reduced carry (plain block_until_ready does not reliably
    synchronize over the remote TPU tunnel; dispatch-loop timing there
    overestimates throughput by orders of magnitude). One compile+warmup
    pass, then the mean of `passes` steady-state passes.

    Pass every large array `step` needs (weights, input tensors) through
    `*args`, NOT via closure: closed-over arrays are baked into the jitted
    program as constants, which bloats the HLO and can exceed the remote
    backend's compile-request size cap (observed: HTTP 413 with a ~300 MB
    closed-over weight tree).
    """
    import numpy as np

    @jax.jit
    def chained(c0, *a):
        c, _ = jax.lax.scan(lambda c, _: (step(c, *a), ()), c0, None,
                            length=iters)
        return jax.tree.map(lambda t: jnp.asarray(t).mean(), c)

    def run():
        return np.asarray(jax.tree.leaves(chained(carry0, *args))[0])

    run()                                        # compile + warmup
    dts = []
    for _ in range(max(1, passes)):
        t0 = time.perf_counter()
        run()
        dts.append(time.perf_counter() - t0)
    return sum(dts) / len(dts) / iters
