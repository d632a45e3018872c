"""Geo-features stage: XLA knn+gather path vs fused Pallas kernel (ops/geo.py).

True device times at MAP3DBN512L shapes (B x 147,456 points, V=6890)."""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from benchmarks.timing import device_time, rpc_floor
from threedhumangan_tpu.models.smpl import get_geo_features
from threedhumangan_tpu.ops.geo import build_vertex_features, geo_features_pallas

B = int(os.environ.get("BENCH_BATCH", "8"))
P = int(os.environ.get("BENCH_POINTS", str(48 * 96 * 32)))
V, J = 6890, 24
TILE = int(os.environ.get("BENCH_GEO_TILE", "128"))

rng = jax.random.PRNGKey(0)
keys = jax.random.split(rng, 6)
points = jax.random.normal(keys[0], (B, P, 3))
vertices = jax.random.normal(keys[1], (B, V, 3))
tpose = jax.random.normal(keys[2], (B, V, 3))
skel = jax.random.normal(keys[3], (B, J, 3))
fk = jnp.broadcast_to(jnp.eye(4), (B, J, 4, 4)) + 0.01 * jax.random.normal(
    keys[4], (B, J, 4, 4))
lbs = jax.nn.softmax(jax.random.normal(keys[5], (B, V, J)), axis=-1)

print(f"rpc floor {rpc_floor()*1000:.1f} ms; B={B} P={P} tile={TILE}", flush=True)

which = os.environ.get("BENCH_WHICH", "both")

if which in ("both", "xla"):
    def st_xla(i, c):
        g = get_geo_features(points + c, skel, vertices, tpose, fk, lbs,
                             use_pallas_knn=True)
        return jnp.sum(g) * 1e-20
    per, _ = device_time(st_xla, n1=2, n2=6)
    print(f"xla knn+gather : {per*1000:8.2f} ms/batch{B}", flush=True)

if which in ("both", "pallas"):
    def st_pal(i, c):
        vfeat = build_vertex_features(tpose, fk, lbs)
        g = geo_features_pallas(points + c, vertices, vfeat, skel,
                                tile_points=TILE)
        return jnp.sum(g) * 1e-20
    per, _ = device_time(st_pal, n1=2, n2=6)
    print(f"pallas fused   : {per*1000:8.2f} ms/batch{B}", flush=True)
