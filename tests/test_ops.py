"""Golden-value tests for the core detection ops.

Bilinear resize is checked against torch.nn.functional.interpolate (the
exact op the reference calls, dit_backbone.py:56-61). NMS and RoIAlign are
checked against literal, loop-based numpy transcriptions of the
torchvision algorithms (torchvision itself is not installed here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.boxes import (
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    small_box_mask,
)
from layoutdit_tpu.ops.interpolate import (
    max_pool_stride2,
    resize_bilinear,
    resize_bilinear_np,
)
from layoutdit_tpu.ops.nms import batched_nms_mask, nms_mask
from layoutdit_tpu.ops.roi_align import multiscale_roi_align, roi_align

# ---------------------------------------------------------------- bilinear


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (56, 56)), ((14, 14), (28, 28)), ((14, 14), (7, 7)),
     ((97, 61), (224, 224)), ((300, 400), (224, 224))],
)
def test_resize_bilinear_matches_torch(rng, in_hw, out_hw):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=False
    ).numpy()
    # torch computes interp weights in float32; ours are float64 -> tiny drift
    got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_np = resize_bilinear_np(x, *out_hw)
    np.testing.assert_allclose(got_np, want, rtol=1e-4, atol=1e-4)


def test_max_pool_stride2_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 5, 7, 7)).astype(np.float32)
    want = F.max_pool2d(torch.from_numpy(x), 1, 2, 0).numpy()
    got = np.asarray(max_pool_stride2(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------------------- boxes


def test_box_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], rtol=1e-6)


def test_encode_decode_roundtrip(rng):
    anchors = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(1, 50, (50, 2))
    gt = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(1, 50, (50, 2))
    w = (10.0, 10.0, 5.0, 5.0)
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), w)
    back = decode_boxes(deltas, jnp.asarray(anchors), w)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


def test_decode_clamps_extreme_deltas():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # would exp-overflow
    out = np.asarray(decode_boxes(deltas, boxes))
    assert np.isfinite(out).all()
    # width capped at 10 * 1000/16
    assert out[0, 2] - out[0, 0] == pytest.approx(10 * 1000.0 / 16.0, rel=1e-4)


def test_clip_and_small_mask():
    boxes = jnp.array([[-5.0, -5.0, 300.0, 100.0], [0.0, 0.0, 0.5, 50.0]])
    clipped = np.asarray(clip_boxes_to_image(boxes, 224, 224))
    np.testing.assert_allclose(clipped[0], [0, 0, 224, 100])
    mask = np.asarray(small_box_mask(boxes, 1.0))
    assert mask.tolist() == [True, False]


# --------------------------------------------------------------------- nms


def _nms_ref(boxes, scores, thresh):
    """Literal greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if not np.isfinite(scores[i]):
            continue
        ok = True
        for j in np.flatnonzero(keep):
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a1 + a2 - inter) if a1 + a2 - inter > 0 else 0.0
            if iou > thresh:
                ok = False
                break
        keep[i] = ok
    return keep


def test_nms_matches_reference(rng):
    n = 200
    boxes = rng.uniform(0, 100, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 60, (n, 2))
    scores = rng.uniform(0, 1, n).astype(np.float32)
    scores[17] = -np.inf  # padding row
    want = _nms_ref(boxes, scores, 0.5)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(got, want)


def test_nms_suppression_chain():
    # b0 suppresses b1; b1 (suppressed) must NOT suppress b2.
    boxes = np.array(
        [[0, 0, 10, 10], [1, 0, 11, 10], [8, 0, 18, 10]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_dense_clusters_match_reference(rng):
    """Stress the blocked kernel's within/cross-tile logic: 400 boxes
    crammed into a small area -> deep suppression chains crossing tile
    boundaries."""
    n = 400
    centers = rng.uniform(20, 60, (n, 2)).astype(np.float32)
    sizes = rng.uniform(10, 30, (n, 2)).astype(np.float32)
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in (0.3, 0.5, 0.7):
        want = _nms_ref(boxes, scores, thresh)
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        np.testing.assert_array_equal(got, want, err_msg=f"thresh={thresh}")


def test_nms_exact_tile_boundary(rng):
    """N an exact multiple of the 128 tile and duplicates straddling it."""
    n = 256
    boxes = np.tile(np.array([[0, 0, 10, 10]], np.float32), (n, 1))
    boxes += rng.uniform(0, 0.01, (n, 4)).astype(np.float32)  # near-identical
    scores = np.linspace(1, 0, n).astype(np.float32)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    want = _nms_ref(boxes, scores, 0.5)
    np.testing.assert_array_equal(got, want)


def test_batched_nms_isolates_categories():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    same = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.array([0, 0]), 0.5)
    )
    diff = np.asarray(
        batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.array([0, 1]), 0.5)
    )
    assert same.tolist() == [True, False]
    assert diff.tolist() == [True, True]


def test_nms_valid_mask():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                 valid=jnp.array([True, False]))
    )
    assert keep.tolist() == [True, False]


def test_nms_empty_input():
    # N=0 must return an empty mask, not divide by zero in the tile-count
    # arithmetic (regression: the tile clamp made TILE_=0 at n=0).
    keep = np.asarray(
        nms_mask(jnp.zeros((0, 4), jnp.float32), jnp.zeros((0,), jnp.float32),
                 0.5)
    )
    assert keep.shape == (0,)


# --------------------------------------------------------------- roi_align


def _bilinear_ref(feat, y, x):
    c, h, w = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(c, dtype=np.float64)
    y = max(y, 0.0); x = max(x, 0.0)
    y_low = int(y); x_low = int(x)
    y_high = y_low + 1
    x_high = x_low + 1
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    ly = y - y_low; lx = x - x_low
    hy = 1.0 - ly; hx = 1.0 - lx
    return (hy * hx * feat[:, y_low, x_low] + hy * lx * feat[:, y_low, x_high]
            + ly * hx * feat[:, y_high, x_low] + ly * lx * feat[:, y_high, x_high])


def _roi_align_ref(feat, rois, scale, p=7, g=2):
    """Literal torchvision roi_align, aligned=False."""
    k = len(rois)
    c = feat.shape[0]
    out = np.zeros((k, c, p, p), dtype=np.float64)
    for ki, roi in enumerate(rois):
        sw = roi[0] * scale; sh = roi[1] * scale
        rw = max(roi[2] * scale - sw, 1.0)
        rh = max(roi[3] * scale - sh, 1.0)
        bw = rw / p; bh = rh / p
        for ph in range(p):
            for pw in range(p):
                acc = np.zeros(c, dtype=np.float64)
                for iy in range(g):
                    yy = sh + ph * bh + (iy + 0.5) * bh / g
                    for ix in range(g):
                        xx = sw + pw * bw + (ix + 0.5) * bw / g
                        acc += _bilinear_ref(feat, yy, xx)
                out[ki, :, ph, pw] = acc / (g * g)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.standard_normal((4, 20, 24)).astype(np.float32)
    rois = np.array(
        [
            [10.0, 8.0, 60.0, 50.0],
            [0.0, 0.0, 96.0, 80.0],   # full image
            [30.0, 30.0, 31.0, 31.0],  # tiny box -> max(.,1) path
            [-10.0, -10.0, 20.0, 20.0],  # out-of-range samples
            [80.0, 60.0, 200.0, 200.0],  # beyond feature extent
        ],
        dtype=np.float32,
    )
    scale = 0.25
    want = _roi_align_ref(feat, rois, scale)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), scale))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pooled_from_weights_custom_vjp_matches_autodiff(rng):
    """The hand-written bf16-friendly backward must equal autodiff of the
    plain einsum formulation (fp32 here)."""
    from layoutdit_tpu.ops.roi_align import build_roi_weights, pooled_from_weights

    feat = jnp.asarray(rng.standard_normal((8, 20, 24)).astype(np.float32))
    rois = np.array([[4.0, 4.0, 40.0, 40.0], [10.0, 2.0, 70.0, 66.0]], np.float32)
    wy, wx = build_roi_weights(jnp.asarray(rois), 0.25, (20, 24))

    def ref(f):
        return jnp.einsum("kph,chw,kqw->kcpq", wy, f, wx)

    ct = jnp.asarray(rng.standard_normal((2, 8, 7, 7)).astype(np.float32))
    g_custom = jax.grad(lambda f: (pooled_from_weights(f, wy, wx) * ct).sum())(feat)
    g_ref = jax.grad(lambda f: (ref(f) * ct).sum())(feat)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_roi_align_mask_zeroes_invalid(rng):
    feat = rng.standard_normal((2, 8, 8)).astype(np.float32)
    rois = np.array([[0, 0, 16, 16], [0, 0, 16, 16]], dtype=np.float32)
    out = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.5,
                  roi_mask=jnp.array([True, False]))
    )
    assert np.abs(out[0]).sum() > 0
    np.testing.assert_array_equal(out[1], 0)


def test_multiscale_roi_align_level_routing(rng):
    # Two levels: p2 (1/4, 56x56) and p3 (1/8, 28x28) for a 224 image.
    f2 = rng.standard_normal((3, 56, 56)).astype(np.float32)
    f3 = rng.standard_normal((3, 28, 28)).astype(np.float32)
    small = [10.0, 10.0, 60.0, 60.0]    # sqrt(area)=50 -> lvl 2
    big = [0.0, 0.0, 200.0, 200.0]      # sqrt(area)=200 -> lvl 3 (canonical 4 => 224->4)
    rois = np.array([small, big], dtype=np.float32)
    got = np.asarray(
        multiscale_roi_align(
            [jnp.asarray(f2), jnp.asarray(f3)], jnp.asarray(rois),
            [0.25, 0.125], canonical_level=4, canonical_scale=224.0,
        )
    )
    want_small = _roi_align_ref(f2, rois[:1], 0.25)
    want_big = _roi_align_ref(f3, rois[1:], 0.125)
    np.testing.assert_allclose(got[0], want_small[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1], want_big[0], rtol=1e-4, atol=1e-5)
