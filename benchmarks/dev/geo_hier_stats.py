"""Measure per-tile candidate-cluster statistics for the hierarchical geo
1-NN design: Morton-chunk the posed vertices into C clusters of L, compute
the exact triangle-inequality candidate set per point (lb <= ub), and report
the per-tile union size distribution for several tilings.  Decides L, S and
whether rays need 4x4 patch reordering before the kernel is written."""
import sys

sys.path.insert(0, "/root/repo")

import jax

# the axon JAX_PLATFORMS env cannot be overridden by env (verify-skill
# gotcha); per-item eager dataset building over the TPU RPC tunnel is
# minutes-slow, so force the CPU backend the way the apps do
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from threedhumangan_tpu import configs
from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
from threedhumangan_tpu.data.preprocessor import get_preprocessor
from threedhumangan_tpu.models import volume_rendering as vr
from threedhumangan_tpu.models.smpl import synthetic_smpl_model

B = 2
meta = dict(configs.extract_metadata(configs.MAP3DBN512L, 0))
meta.update(dataset_length=B, nerf_noise=0.0, perturb_rays=False)
smpl = synthetic_smpl_model(num_verts=6890, num_faces=13776)
ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
pre = get_preprocessor(meta, smpl_model=smpl)
batch = next(iterate_batches(ds, B, shuffle=False))
batch = {k: jnp.asarray(v) for k, v in batch.items()}
rng = jax.random.PRNGKey(0)
# camera setup only — the rasterizer is irrelevant to NN stats and slow on CPU
zero = jnp.zeros((B,), jnp.float32)
cond = jax.jit(lambda b: pre._forward_fix_body(b, zero, zero, zero))(batch)

RW, RH, S = meta["render_width"], meta["render_height"], meta["num_steps"]
R, P = RW * RH, RW * RH * S
focals = cond["intrinsics"][:, 0, 0]
scales = cond["scales"].astype(jnp.float32)
pts_cam, zv, rd_cam = vr.get_initial_rays_weak_perspective(
    focals, scales, S, resolution=(RW, RH),
    ray_start=meta["ray_start"], ray_end=meta["ray_end"])
(points, *_rest) = vr.transform_sampled_points(
    pts_cam, zv, rd_cam, rng, cam2world_matrix=cond["cam2world_matrices"],
    mode=meta.get("sample_dist"), h_stddev=0.0, v_stddev=0.0, perturb=False)
points = np.asarray(points.reshape(B, P, 3))
verts = np.asarray(cond["vertices"])  # (B, V, 3)
V = verts.shape[1]


def morton(v):
    q = np.clip(((v - v.min(0)) / (np.ptp(v, 0) + 1e-9) * 255).astype(np.int64), 0, 255)
    code = np.zeros(len(v), np.int64)
    for bit in range(8):
        for ax in range(3):
            code |= ((q[:, ax] >> bit) & 1) << (3 * bit + ax)
    return np.argsort(code, kind="stable")


def ray_patch_perm(rw, rh, pw=4, ph=4):
    """Row-major ray index -> 4x4-patch-major order."""
    idx = np.arange(rh * rw).reshape(rh, rw)
    out = []
    for r0 in range(0, rh, ph):
        for c0 in range(0, rw, pw):
            out.append(idx[r0 : r0 + ph, c0 : c0 + pw].ravel())
    return np.concatenate(out)


for L in (64, 128):
    counts_all = {}
    for b in range(B):
        perm = morton(verts[b])
        vp = verts[b][perm]
        pad = (-V) % L
        if pad:
            vp = np.concatenate([vp, np.repeat(vp[-1:], pad, 0)])
        C = len(vp) // L
        cl = vp.reshape(C, L, 3)
        cent = cl.mean(1)                                   # (C, 3)
        rad = np.sqrt(((cl - cent[:, None]) ** 2).sum(-1)).max(1)  # (C,)

        dc = np.sqrt(((points[b][:, None] - cent[None]) ** 2).sum(-1))  # (P, C)
        ub = (dc + rad[None]).min(1, keepdims=True)
        flag = (dc - rad[None]) <= ub + 1e-4                 # (P, C)

        for name, T, rperm in (
            ("strip512", 512, None),
            ("patch4x4", 512, ray_patch_perm(RW, RH)),
            ("strip1024", 1024, None),
            ("patch4x4_1024", 1024, ray_patch_perm(RW, RH)),
        ):
            f = flag.reshape(R, S, C)
            if rperm is not None:
                f = f[rperm]
            f = f.reshape(P // T, T, C).any(1).sum(1)  # union size per tile
            counts_all.setdefault(name, []).append(f)
    print(f"L={L} C={C}")
    for name, fs in counts_all.items():
        f = np.concatenate(fs)
        print(f"  {name:16s} mean {f.mean():5.1f}  p50 {np.percentile(f,50):4.0f}"
              f"  p95 {np.percentile(f,95):4.0f}  p99 {np.percentile(f,99):4.0f}"
              f"  max {f.max():4d}")
    print(f"  per-point candidate mean {flag.sum(1).mean():5.1f}")
