"""Debug / introspection utilities.

Behavioural parity with reference ``lib/components/nv_misc.py``:
  assert_shape          (ref :82-95)
  profiled_function     (ref :100-105 — torch profiler record_function;
                         here a jax.profiler TraceAnnotation + named_scope)
  constant              (ref :24-43 — cached device constants)
  print_module_summary  (ref :194-262 — param-count table for a pytree)
  check_replica_consistency (ref check_ddp_consistency :180-189 — broadcast
                         -and-compare across ranks; here a cross-device
                         equality check over a mesh)
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_constant_cache: Dict = {}


def constant(value, shape=None, dtype=None):
    """Cached device constant (ref nv_misc.py:24-43)."""
    key = (np.asarray(value).tobytes(), shape, dtype)
    if key not in _constant_cache:
        arr = jnp.asarray(value, dtype=dtype)
        if shape is not None:
            arr = jnp.broadcast_to(arr, shape)
        _constant_cache[key] = arr
    return _constant_cache[key]


def assert_shape(tensor, ref_shape: Sequence[Optional[int]]):
    """Shape contract check; None entries are wildcards (ref :82-95)."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is not None and size != ref_size:
            raise AssertionError(f"Wrong size for dimension {idx}: got {size}, expected {ref_size}")


def profiled_function(fn):
    """Annotate a function for jax.profiler traces (ref :100-105)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            with jax.named_scope(fn.__name__):
                return fn(*args, **kwargs)

    return wrapper


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def print_module_summary(tree, name: str = "params", max_depth: int = 2) -> str:
    """Param-count table over a pytree (ref print_module_summary :194-262)."""
    rows = []

    def walk(prefix, sub, depth):
        if depth >= max_depth or not isinstance(sub, dict):
            rows.append((prefix, count_params(sub)))
            return
        for k, v in sub.items():
            walk(f"{prefix}.{k}" if prefix else str(k), v, depth + 1)

    walk("", tree, 0)
    total = count_params(tree)
    width = max((len(r[0]) for r in rows), default=10)
    lines = [f"{name}: {total:,} parameters"]
    for path, n in rows:
        lines.append(f"  {path:<{width}}  {n:>12,}")
    out = "\n".join(lines)
    print(out)
    return out


def check_replica_consistency(tree, mesh, axis_name: str = "data") -> bool:
    """All-device parameter equality check (ref check_ddp_consistency
    :180-189).  Returns True when every replica holds identical values."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def check(t):
        def local(x):
            ref = jax.lax.pmean(x, axis_name)
            return jnp.max(jnp.abs(x - ref))

        diffs = [
            shard_map(local, mesh=mesh, in_specs=P(), out_specs=P(), check_rep=False)(x)
            for x in jax.tree.leaves(t)
        ]
        return max(float(jnp.max(d)) for d in diffs) if diffs else 0.0

    return check(tree) == 0.0
