"""Cross-replica training statistics.

Behavioural parity with reference ``lib/components/training_stats.py``:
``report()`` accumulates (count, sum, sum-of-squares) moments per name
(ref :53-96); ``Collector`` syncs with ONE collective per update
(ref :231-263 — there a torch.distributed all_reduce; here the moments are
psum'd inside the jitted step so the sync rides the same ICI collectives as
the gradients, and the host only ever sees final scalars).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def moments(x: jax.Array) -> jax.Array:
    """[count, sum, sum_sq] of a tensor, as one length-3 vector."""
    x = x.astype(jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(jnp.square(x))])


def psum_moments(stats: Dict[str, jax.Array], axis_name: Optional[str]) -> Dict[str, jax.Array]:
    """One psum over the stacked moment vectors (single collective)."""
    if axis_name is None or not stats:
        return stats
    names = sorted(stats)
    stacked = jnp.stack([stats[n] for n in names])
    stacked = jax.lax.psum(stacked, axis_name)
    return {n: stacked[i] for i, n in enumerate(names)}


class Collector:
    """Host-side accumulator over per-step moment dicts (ref :140-263)."""

    def __init__(self, regex: str = ".*"):
        self._regex = re.compile(regex)
        self._moments: Dict[str, np.ndarray] = {}

    def update(self, stats: Dict[str, jax.Array]) -> None:
        for name, m in stats.items():
            if not self._regex.fullmatch(name):
                continue
            m = np.asarray(m)
            if name in self._moments:
                self._moments[name] = self._moments[name] + m
            else:
                self._moments[name] = m

    def names(self):
        return list(self._moments)

    def num(self, name) -> float:
        return float(self._moments[name][0]) if name in self._moments else 0.0

    def mean(self, name) -> float:
        if name not in self._moments or self._moments[name][0] == 0:
            return float("nan")
        c, s, _ = self._moments[name]
        return float(s / c)

    def std(self, name) -> float:
        if name not in self._moments or self._moments[name][0] == 0:
            return float("nan")
        c, s, ss = self._moments[name]
        mean = s / c
        var = max(ss / c - mean * mean, 0.0)
        return float(np.sqrt(var))

    def __getitem__(self, name) -> float:
        return self.mean(name)

    def reset(self):
        self._moments.clear()
