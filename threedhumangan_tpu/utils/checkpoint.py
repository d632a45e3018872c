"""Step-stamped pytree checkpoints with keep-interval pruning.

Behavioural parity with reference ``lib/trainers/base_trainer.py``
save_model/init_model (:74-91, :183-202): save every N steps, prune files
whose step is not a multiple of ``keep_interval``, resume from the latest.
Unlike the reference (whole pickled torch modules + source-embedding
``persistence``), checkpoints here are plain pytrees of arrays + a config
echo — safe across code drift by construction, so no source pickling is
needed (that is the role persistence.py:35-120 plays in the reference).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

_CKPT_RE = re.compile(r"^(\d{8})_checkpoint\.pkl$")


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_dir: str, step: int, payload: Dict[str, Any],
                    keep_interval: int = 5000) -> str:
    os.makedirs(output_dir, exist_ok=True)
    prune_checkpoints(output_dir, keep_interval)
    path = os.path.join(output_dir, f"{step:08d}_checkpoint.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"step": step, **_to_host(payload)}, f, protocol=4)
    os.replace(tmp, path)
    return path


def prune_checkpoints(output_dir: str, keep_interval: int) -> None:
    """Delete auto-saves not on the keep grid (ref :186-189)."""
    if not os.path.isdir(output_dir):
        return
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and keep_interval > 0 and int(m.group(1)) % keep_interval != 0:
            os.remove(os.path.join(output_dir, name))


def latest_checkpoint(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    steps.sort()
    return os.path.join(output_dir, steps[-1][1])


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
