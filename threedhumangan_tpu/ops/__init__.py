"""TPU-native op library.

Functional equivalents of every native component in SURVEY.md §2.7:
  bias_act          — fused bias+activation (ref ops/bias_act.{cpp,cu,py})
  upfirdn2d family  — FIR resampling (ref ops/upfirdn2d.{cpp,cu,py})
  filtered_lrelu    — StyleGAN3 fused resample+lrelu (ref ops/filtered_lrelu.*)
  conv2d_resample   — conv with fused resampling (ref ops/conv2d_resample.py)
  fma               — addcmul (ref ops/fma.py)
  knn_points/gather — replaces pytorch3d CUDA KNN (ref smpl.py:220-233)
  rasterize_mesh    — replaces pytorch3d MeshRasterizer (ref preprocessor.py:137-176)

The reference's conv2d_gradfix / grid_sample_gradfix exist only to give torch
arbitrary-order conv/grid-sample gradients; JAX differentiates these natively,
so grid_sample (in data/augment.py) and conv ops need no fix-up wrappers.
"""

from threedhumangan_tpu.ops.bias_act import activation_funcs, bias_act
from threedhumangan_tpu.ops.conv2d_resample import conv2d, conv2d_resample, fma
from threedhumangan_tpu.ops.filtered_lrelu import filtered_lrelu
from threedhumangan_tpu.ops.knn import knn_gather, knn_points
from threedhumangan_tpu.ops.rasterize import rasterize_mesh
from threedhumangan_tpu.ops.raymarch import fused_field_render, pack_field_inputs
from threedhumangan_tpu.ops.upfirdn2d import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


def grid_sample(img, grid):
    """Bilinear grid sampling, zero padding (replaces grid_sample_gradfix —
    ref ops/grid_sample_gradfix.py:55-75; JAX gathers are natively
    double-differentiable).  img NHWC; grid (B, H, W, 2) xy in [-1, 1]."""
    from threedhumangan_tpu.data.augment import grid_sample_bilinear

    return grid_sample_bilinear(img, grid)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    """rosinality fused bias+lrelu (ref ops/fused_act.py:19-86 public op)."""
    return bias_act(x, bias, axis=-1, act="lrelu", alpha=negative_slope, gain=scale)
