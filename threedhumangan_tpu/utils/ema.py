"""Exponential moving average of a parameter pytree.

Behavioural parity with reference ``lib/components/ema.py``: warmup decay
``min(decay, (1 + n) / (10 + n))`` (ref :40-48); store/copy_to/restore are
unnecessary in a functional setting — the EMA params are just another pytree
you can evaluate with directly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def ema_init(params) -> Dict:
    return {
        "params": jax.tree.map(jnp.array, params),
        "count": jnp.zeros((), jnp.int32),
    }


def ema_update(ema: Dict, params, decay: float = 0.999) -> Dict:
    count = ema["count"] + 1
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    new = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p), ema["params"], params)
    return {"params": new, "count": count}
