"""Trustworthy device timing under the axon TPU tunnel.

Under the remote-execution tunnel, ``jax.block_until_ready`` can return
immediately (buffers are "ready" as remote handles), so wall-clock timing
of dispatched calls measures RPC/dispatch overhead, not device time.

The reliable pattern: run the workload N times *inside one jit* with a
data dependence threaded through a scalar carry (so XLA cannot elide or
reorder iterations), return a scalar checksum, and force materialization
with ``float()`` (a real device->host transfer).  Timing two different
trip counts with the same compiled function (dynamic ``fori_loop`` trip
count) cancels the constant RPC + transfer overhead:

    per_iter = (t(n2) - t(n1)) / (n2 - n1)
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time(step: Callable, n1: int = 2, n2: int = 10, warmup: bool = True,
                args: tuple = ()):
    """Measure per-iteration device time of ``step``.

    Args:
      step: ``step(i, carry, *args) -> new_carry`` where carry is a f32
        scalar.  The implementation must fold ``carry`` into its inputs
        (e.g. ``z + 1e-30 * carry``) so iterations serialize, and reduce
        its output to a scalar.
      n1, n2: the two trip counts to difference.
      args: arrays/pytrees passed as jit ARGUMENTS rather than captured in
        the closure — anything large MUST ride here, or it is embedded as
        an HLO constant and the tunnel's remote-compile request blows its
        size limit (and compiles take tens of minutes).

    Returns:
      (seconds_per_iteration, checksum)
    """

    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(
            0, n, lambda i, c: step(i, c, *a), jnp.float32(0.0))

    if args:
        _inner = run
        run = lambda n: _inner(n, *args)

    if warmup:
        float(run(1))  # compile + warm caches

    def timed(n):
        t0 = time.perf_counter()
        out = float(run(n))
        return time.perf_counter() - t0, out

    t_1, _ = timed(n1)
    t_2, chk = timed(n2)
    return (t_2 - t_1) / (n2 - n1), chk


def rpc_floor():
    """Measure the fixed per-materialization round-trip cost."""

    @jax.jit
    def trivial(x):
        return jnp.sum(x) * 1e-30

    x = jnp.ones((8, 8), jnp.float32)
    float(trivial(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial(x))
    return (time.perf_counter() - t0) / 5
