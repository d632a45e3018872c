"""Trainable fused synthesis half-blocks (ops/synthesis_train.py) vs the
per-op XLA path (models/synthesis.apply_spade_block, batch_norm, train=True).

Interpret mode on CPU at f32 compute: the two paths then differ only by
matmul reduction order, so forward AND gradient parity are tight.  The same
kernels compile for TPU (bf16 compute in production)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threedhumangan_tpu.models import synthesis as syn

B, H, W, C, CS = 2, 8, 128, 64, 48


@pytest.fixture
def block(rng):
    params, state = syn.init_spade_block(rng, C, C, CS, "batch_norm")
    # non-trivial BN affine + running stats so eval/train paths differ
    params["spade_0"]["norm"] = {"scale": jnp.linspace(0.5, 1.5, C),
                                 "bias": jnp.linspace(-0.2, 0.2, C)}
    params["spade_1"]["norm"] = {"scale": jnp.linspace(1.2, 0.8, C),
                                 "bias": jnp.linspace(0.1, -0.1, C)}
    return params, state


def _inputs(rng, spatial=True):
    kx, ks, kf = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (B, H, W, C))
    style = (jax.random.normal(ks, (B, H, W, CS)) if spatial
             else jax.random.normal(ks, (B, 1, CS)))
    fs = jax.random.normal(kf, (B, CS))
    return x, style, fs


def _xla_block(params, state, x, style, fixed_row=None):
    input_style = style
    if fixed_row is not None:
        input_style = style + fixed_row[:, None, None, :]
    return syn.apply_spade_block(
        params, state, x, input_style, "batch_norm", skip=True, train=True,
        compute_dtype=jnp.float32)


def _fused_block(params, state, x, style, fixed_row=None):
    return syn.apply_spade_block_fused(
        params, state, x, style, fixed_row, skip=True,
        compute_dtype=jnp.float32, tile_rows=2, interpret=True)


@pytest.mark.parametrize("with_fixed", [False, True])
def test_fused_block_forward_parity_spatial(rng, block, with_fixed):
    params, state = block
    x, style, fs = _inputs(rng, spatial=True)
    fr = fs if with_fixed else None
    ref, ref_state = _xla_block(params, state, x, style, fr)
    got, got_state = _fused_block(params, state, x, style, fr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # state updates (running stats + spectral u) must match too
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        got_state, ref_state)


def test_fused_block_forward_parity_global_style(rng, block):
    params, state = block
    x, style, _ = _inputs(rng, spatial=False)
    ref, _ = _xla_block(params, state, x, style)
    got, _ = _fused_block(params, state, x, style)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("spatial", [True, False])
def test_fused_block_gradient_parity(rng, block, spatial):
    """Full gradient parity in every differentiable input: params (conv +
    SPADE MLPs + BN affine), x (through the batch-stat BN backward), style,
    and the fixed row.  The batch moments are differentiable — sync-BN
    semantics (models/synthesis.py apply_sync_batch_norm)."""
    params, state = block
    x, style, fs = _inputs(rng, spatial=spatial)
    fr = fs if spatial else None

    def loss(fn, params, x, style, fr):
        # mean (not sum): the conv biases feed straight into a batch-stat
        # BN, so their true gradient is analytically ZERO — what autodiff
        # returns there is catastrophic-cancellation noise over B*H*W
        # terms in both paths; a mean loss keeps that noise below atol
        out, _ = fn(params, state, x, style, fr)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    args = (params, x, style, fr) if spatial else (params, x, style, None)
    g_ref = jax.grad(functools.partial(loss, _xla_block),
                     argnums=(0, 1, 2) + ((3,) if spatial else ()))(*args)
    g_got = jax.grad(functools.partial(loss, _fused_block),
                     argnums=(0, 1, 2) + ((3,) if spatial else ()))(*args)

    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_got, tree = jax.tree.flatten(g_got)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_got, flat_ref):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=2e-4)


@pytest.mark.parametrize("mode", ["isolated", "mixed", "all"])
@pytest.mark.heavy
def test_fused_network_parity(rng, mode):
    """apply_synthesis_network fused vs per-op: 4 blocks, mod_blocks=(0,1),
    skip + ToRGB + both style kinds exercised; forward and wrt-params grad."""
    nb = 4
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params, state, meta = syn.init_synthesis_network(
        k1, C, CS, hidden_dim=C, num_blocks=nb, mod_blocks=(0, 1),
        spatial_normalization="batch_norm", map3d_mode=mode)
    x = jax.random.normal(k2, (B, H, W, C))
    style = jax.random.normal(k3, (B, H, W, CS))
    fixed = jax.random.normal(k4, (B, 1, CS))

    meta_f = dict(meta, fused_train=True, fused_tile_rows=2, fused_interpret=True)

    def run(m, params):
        out, new_state = syn.apply_synthesis_network(
            params, state, m, x, style, fixed, train=True,
            compute_dtype=jnp.float32)
        return out["final"], new_state

    ref, ref_state = run(meta, params)
    got, got_state = run(meta_f, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        got_state, ref_state)

    g_ref = jax.grad(lambda p: jnp.mean(run(meta, p)[0] ** 2))(params)
    g_got = jax.grad(lambda p: jnp.mean(run(meta_f, p)[0] ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=3e-4)


def test_fused_block_bf16_smoke(rng, block):
    """bf16 compute (the production dtype): forward stays within bf16-level
    tolerance of the XLA bf16 path."""
    params, state = block
    x, style, _ = _inputs(rng, spatial=True)
    ref, _ = syn.apply_spade_block(
        params, state, x.astype(jnp.bfloat16), style, "batch_norm",
        skip=True, train=True, compute_dtype=jnp.bfloat16)
    got, _ = syn.apply_spade_block_fused(
        params, state, x.astype(jnp.bfloat16), style, None, skip=True,
        compute_dtype=jnp.bfloat16, tile_rows=2, interpret=True)
    ref32 = np.asarray(ref, np.float32)
    got32 = np.asarray(got, np.float32)
    denom = np.maximum(np.abs(ref32), 1.0)
    assert np.max(np.abs(got32 - ref32) / denom) < 0.1


@pytest.mark.slow
def test_fused_train_step_end_to_end():
    """Full G train step (NANO) with the fused synthesis kernels in
    interpret mode: params update, everything finite, BN state advances.
    Numerical parity is pinned at block/network level above — this guards
    the trainer plumbing (meta flags, batch_split scan, custom VJP under
    jit/value_and_grad)."""
    from threedhumangan_tpu import configs
    from threedhumangan_tpu.data.dataset import SyntheticSHHQDataset, iterate_batches
    from threedhumangan_tpu.data.preprocessor import get_preprocessor
    from threedhumangan_tpu.models.smpl import synthetic_smpl_model
    from threedhumangan_tpu.trainers.phase_trainer import (
        init_train_state,
        train_step_pair,
    )

    meta = dict(configs.extract_metadata(configs.MAP3DBN_NANO, 0))
    meta.update(pallas_synthesis_train=True, pallas_interpret=True,
                remat_synthesis=False)
    smpl = synthetic_smpl_model(num_verts=96, num_faces=64)
    ds = SyntheticSHHQDataset(smpl_model=smpl, **meta)
    pre = get_preprocessor(meta, smpl_model=smpl)
    batch = {k: jnp.asarray(v) for k, v in next(iterate_batches(ds, 2, shuffle=False)).items()}
    rng = jax.random.PRNGKey(0)
    ts = init_train_state(rng, meta)
    phase = {"rotate": False, "do_r1": True, "uncond": True, "gen_modal": "rgbs"}
    ts2, stats = train_step_pair(ts, batch, rng, meta, pre, phase,
                                 lr_g=1e-4, lr_d=4e-4, nerf_noise=0.5)
    assert int(ts2.step) == 1
    g0 = np.asarray(ts.params_G["synthesis_network"]["blocks"][0]["conv_0"]["w"])
    g1 = np.asarray(ts2.params_G["synthesis_network"]["blocks"][0]["conv_0"]["w"])
    assert np.isfinite(g1).all() and np.abs(g1 - g0).max() > 0
    c = ts2.state_G["synthesis_network"]["blocks"][0]["spade_0"]["norm"]["count"]
    assert int(c) == 2  # D-step fakes forward + G-step forward


class TestVmemAutoTiling:
    """tile_rows is computed from the scoped-VMEM model, not guessed
    (ops/synthesis_train.auto_tile_rows).  Calibration anchor: the MAP3DBN
    backward at tile_rows=8/width=128/C=384 measured 16.48 MB scoped on v5e
    (over the 16 MB limit) — the model must (a) reject that point and
    (b) keep its overestimate bounded so usable tile sizes survive."""

    def test_rejects_the_observed_oom_point(self):
        from threedhumangan_tpu.ops.synthesis_train import (
            _VMEM_BUDGET_BYTES,
            auto_tile_rows,
            estimate_half_block_vmem,
        )

        est = estimate_half_block_vmem(8, 128, 384, 384, 384, 128,
                                       spatial=True, bwd=True)
        assert est > 16 * 2**20          # the point that OOM'd must not fit
        assert est < 1.3 * 16.48 * 2**20  # ...but the overestimate is bounded
        t = auto_tile_rows(256, 128, 384, 384, 384, 128)
        assert t < 8
        assert 256 % t == 0
        assert estimate_half_block_vmem(t, 128, 384, 384, 384, 128,
                                        spatial=True, bwd=True) <= _VMEM_BUDGET_BYTES

    @pytest.mark.parametrize("H,W,Ci", [
        (256, 128, 384),   # MAP3DBN
        (512, 256, 256),   # MAP3DBN512
        (512, 256, 420),   # MAP3DBN512L
        (64, 32, 32),      # MAP3DBN_TINY
    ])
    def test_config_shapes_fit_and_divide(self, H, W, Ci):
        from threedhumangan_tpu.ops.synthesis_train import (
            _VMEM_BUDGET_BYTES,
            auto_tile_rows,
            estimate_half_block_vmem,
        )

        t = auto_tile_rows(H, W, Ci, Ci, Ci, 128)
        assert t >= 1 and H % t == 0
        for bwd in (True, False):
            assert estimate_half_block_vmem(
                t, W, Ci, Ci, Ci, 128, spatial=True, bwd=bwd) <= _VMEM_BUDGET_BYTES

    def test_estimate_monotone_in_tile_rows(self):
        from threedhumangan_tpu.ops.synthesis_train import estimate_half_block_vmem

        sizes = [estimate_half_block_vmem(t, 128, 384, 384, 384, 128,
                                          spatial=True, bwd=True)
                 for t in (1, 2, 4, 8, 16)]
        assert sizes == sorted(sizes) and len(set(sizes)) == len(sizes)

    def test_none_tile_rows_auto_sizes(self, rng, block):
        """tile_rows=None (the production default) runs and matches the
        explicit-tile fused path exactly — same kernel, auto-chosen tile."""
        params, state = block
        x, style, _ = _inputs(rng, spatial=True)
        ref, _ = syn.apply_spade_block_fused(
            params, state, x, style, None, skip=True,
            compute_dtype=jnp.float32, tile_rows=2, interpret=True)
        got, _ = syn.apply_spade_block_fused(
            params, state, x, style, None, skip=True,
            compute_dtype=jnp.float32, tile_rows=None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
