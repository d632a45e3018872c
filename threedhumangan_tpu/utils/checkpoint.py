"""Step-stamped pytree checkpoints with keep-interval pruning.

Behavioural parity with reference ``lib/trainers/base_trainer.py``
save_model/init_model (:74-91, :183-202): save every N steps, prune files
whose step is not a multiple of ``keep_interval``, resume from the latest.

Format: ``.npz`` — every array leaf is a named npz entry (name = its tree
path) plus a ``__spec__`` JSON entry recording the container structure
(dicts / lists / tuples / registered NamedTuples such as optax's
ScaleByAdamState) and non-array leaves.  Unlike the reference (whole
pickled torch modules + source-embedding ``persistence``, persistence.py:
35-120) NOTHING is unpickled on load: checkpoints are data, safe across
code drift and safe to load from untrusted paths, and individual subtrees
can be restored without materializing the rest (``only=`` prefix filter).

Legacy ``.pkl`` checkpoints from earlier builds are still READ (resume
compatibility) but never written.
"""

from __future__ import annotations

import collections
import json
import os
import re
from typing import Any, Dict, Optional, Sequence

import numpy as np

_CKPT_RE = re.compile(r"^(\d{8})_checkpoint\.(npz|pkl)$")

# NamedTuple node types that may appear inside a payload.  Anything not
# listed round-trips as a dynamically created namedtuple with the same
# name/fields (attribute-compatible; optax transforms only duck-type
# their state).
try:
    import optax
    _NODE_REGISTRY = {"ScaleByAdamState": optax.ScaleByAdamState}
except Exception:  # pragma: no cover - optax is a hard dep in practice
    _NODE_REGISTRY = {}
_DYN_NT_CACHE: Dict[tuple, Any] = {}


def _unique(name: str, taken: set) -> str:
    base, i = name, 1
    while name in taken:
        name = f"{base}#{i}"
        i += 1
    taken.add(name)
    return name


def _encode(node, path: str, arrays: Dict[str, np.ndarray], taken: set):
    if isinstance(node, dict):
        keys = list(node.keys())
        return {"t": "dict", "k": keys,
                "c": [_encode(node[k], f"{path}/{k}", arrays, taken)
                      for k in keys]}
    if isinstance(node, tuple) and hasattr(node, "_fields"):
        return {"t": "nt", "n": type(node).__name__, "f": list(node._fields),
                "c": [_encode(v, f"{path}/{f}", arrays, taken)
                      for f, v in zip(node._fields, node)]}
    if isinstance(node, (list, tuple)):
        return {"t": "list" if isinstance(node, list) else "tuple",
                "c": [_encode(v, f"{path}/{i}", arrays, taken)
                      for i, v in enumerate(node)]}
    if node is None or isinstance(node, (bool, int, float, str)):
        return {"t": "py", "v": node}
    # array leaf (np/jnp/device arrays, np scalars)
    name = _unique(path.lstrip("/") or "leaf", taken)
    arrays[name] = np.asarray(node)
    return {"t": "a", "k": name}


def _decode(spec, arrays, prefix: str = "", only=None):
    t = spec["t"]
    if t == "a":
        if only is not None and not any(
                prefix.startswith(p) or p.startswith(prefix) for p in only):
            return None
        return arrays[spec["k"]]
    if t == "py":
        return spec["v"]
    if t == "dict":
        return {k: _decode(c, arrays, f"{prefix}/{k}", only)
                for k, c in zip(spec["k"], spec["c"])}
    if t == "nt":
        vals = [_decode(c, arrays, f"{prefix}/{f}", only)
                for f, c in zip(spec["f"], spec["c"])]
        cls = _NODE_REGISTRY.get(spec["n"])
        if cls is None:
            sig = (spec["n"], tuple(spec["f"]))
            cls = _DYN_NT_CACHE.setdefault(
                sig, collections.namedtuple(spec["n"], spec["f"]))
        return cls(*vals)
    if t == "list":
        return [_decode(c, arrays, f"{prefix}/{i}", only)
                for i, c in enumerate(spec["c"])]
    if t == "tuple":
        return tuple(_decode(c, arrays, f"{prefix}/{i}", only)
                     for i, c in enumerate(spec["c"]))
    raise ValueError(f"bad checkpoint spec node {t!r}")


def save_checkpoint(output_dir: str, step: int, payload: Dict[str, Any],
                    keep_interval: int = 5000) -> str:
    os.makedirs(output_dir, exist_ok=True)
    prune_checkpoints(output_dir, keep_interval)
    path = os.path.join(output_dir, f"{step:08d}_checkpoint.npz")
    arrays: Dict[str, np.ndarray] = {}
    spec = _encode({"step": step, **payload}, "", arrays, set())
    tmp = path + ".tmp.npz"  # np.savez appends .npz to unsuffixed names
    with open(tmp, "wb") as f:
        np.savez(f, __spec__=np.asarray(json.dumps(spec)), **arrays)
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


def load_checkpoint(path: str,
                    only: Optional[Sequence[str]] = None) -> Dict[str, Any]:
    """Load a checkpoint payload.

    ``only``: optional iterable of ``/``-separated tree-path prefixes
    (e.g. ``["/train_state/ema", "/step"]``); array leaves outside every
    prefix load as None (their bytes are never copied out of the zip
    member).  Container structure is always fully reconstructed.
    """
    if path.endswith(".pkl"):  # legacy format (round <=2 builds)
        import pickle
        with open(path, "rb") as f:
            return pickle.load(f)
    with np.load(path, allow_pickle=False) as z:
        spec = json.loads(str(z["__spec__"]))
        if only is not None:
            only = tuple(only)
        out = _decode(spec, z, "", only)
    return out
