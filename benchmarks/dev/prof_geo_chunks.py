"""Sweep the geo kernel's (tile_points, vertex_chunks) grid on hardware.

The round-5 question: across vertex chunks, chunk c+1's distance matmul
(MXU) could in principle overlap chunk c's argmin/one-hot passes (VPU) —
more, smaller chunks give the scheduler more such seams.  This measures
whether that pipelining materializes (ms/batch8 at MAP3DBN512L shapes).

Usage: python benchmarks/dev/prof_geo_chunks.py [batch]
"""

import os
import sys

sys.path.insert(0, os.getcwd())


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from benchmarks.timing import device_time
    from threedhumangan_tpu.ops.geo import geo_features_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    P = 48 * 96 * 32  # MAP3DBN512L field points per image
    V, J = 6890, 24

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    pts = jax.random.normal(ks[0], (B, P, 3))
    verts = jax.random.normal(ks[1], (B, V, 3))
    vfeat = jax.random.normal(ks[2], (B, V, 19))
    skel = jax.random.normal(ks[3], (B, J, 3))

    for tile in (256, 512, 1024):
        for chunks in (1, 2, 4, 8):
            try:
                def step(i, carry):
                    out = geo_features_pallas(
                        pts + carry * 1e-30, verts, vfeat, skel,
                        tile_points=tile, vertex_chunks=chunks)
                    return jnp.sum(out[:, :1, :1]) * 1e-30

                per, _ = device_time(step, n1=2, n2=10)
                print(f"tile={tile:5d} chunks={chunks}: {per*1e3:7.2f} ms/batch{B}",
                      flush=True)
            except Exception as e:
                print(f"tile={tile:5d} chunks={chunks}: FAIL {repr(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
