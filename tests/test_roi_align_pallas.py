"""Fused Pallas RoIAlign parity vs the XLA formulation (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.roi_align import multiscale_roi_align


def _setup(rng, k=128, c=64):
    feats = [
        jnp.asarray(rng.standard_normal((c, s, s)).astype(np.float32))
        for s in (56, 28, 14, 7, 4)
    ]
    boxes = rng.uniform(0, 200, (k, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 120, (k, 2))
    scales = [1 / 4, 1 / 8, 1 / 16, 1 / 32, 1 / 64]
    return feats, jnp.asarray(boxes), scales


def test_fused_matches_xla(rng):
    feats, rois, scales = _setup(rng)
    want = multiscale_roi_align(feats, rois, scales, impl="xla")
    got = multiscale_roi_align(feats, rois, scales, impl="pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_fused_with_mask_and_k_padding(rng):
    # K=100 is not a multiple of the 64-roi block -> exercises padding
    feats, rois, scales = _setup(rng, k=100)
    mask = jnp.asarray(rng.uniform(size=100) < 0.7)
    want = multiscale_roi_align(feats, rois, scales, roi_mask=mask, impl="xla")
    got = multiscale_roi_align(
        feats, rois, scales, roi_mask=mask, impl="pallas_interpret"
    )
    assert got.shape == want.shape == (100, 64, 7, 7)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_fused_gradient_matches_xla(rng):
    feats, rois, scales = _setup(rng, k=64, c=64)

    def loss(feats, impl):
        out = multiscale_roi_align(list(feats), rois, scales, impl=impl)
        return (out.astype(jnp.float32) ** 2).sum()

    g_x = jax.grad(lambda f: loss(f, "xla"))(tuple(feats))
    g_p = jax.grad(lambda f: loss(f, "pallas_interpret"))(tuple(feats))
    for gx, gp, s in zip(g_x, g_p, (56, 28, 14, 7, 4)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), atol=5e-3, rtol=1e-3,
            err_msg=f"dfeat level {s}",
        )
