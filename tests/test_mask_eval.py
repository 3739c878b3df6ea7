"""Mask eval tests: paste semantics, RLE export, mask IoU, and the segm
COCOeval protocol (eval/masks.py, eval/coco_eval.py iou_type='segm')."""

import numpy as np

from layoutdit_tpu.data.masks import rle_to_mask
from layoutdit_tpu.eval.coco_eval import CocoEvaluator
from layoutdit_tpu.eval.masks import (
    encode_rle,
    full_to_window,
    mask_iou,
    paste_mask_in_box,
    window_to_full,
)

# ------------------------------------------------------------------ paste


def test_paste_full_prob_covers_box():
    prob = np.ones((28, 28), np.float32)
    x0, y0, bm = paste_mask_in_box(prob, np.array([10, 20, 40, 60]), 100, 100)
    full = window_to_full((x0, y0, bm), 100, 100)
    # the box interior must be covered (the 1-px expand trick grows the
    # footprint slightly beyond the box; interior coverage is the claim)
    assert full[21:59, 11:39].all()
    # far field stays empty
    assert not full[:15, :].any() and not full[70:, :].any()
    assert not full[:, :5].any() and not full[:, 45:].any()


def test_paste_zero_prob_empty():
    prob = np.zeros((28, 28), np.float32)
    _, _, bm = paste_mask_in_box(prob, np.array([10, 20, 40, 60]), 100, 100)
    assert bm.sum() == 0


def test_paste_clamps_at_image_border():
    prob = np.ones((28, 28), np.float32)
    x0, y0, bm = paste_mask_in_box(
        prob, np.array([-5, -8, 20, 30]), 64, 64
    )
    assert x0 >= 0 and y0 >= 0
    assert y0 + bm.shape[0] <= 64 and x0 + bm.shape[1] <= 64
    assert bm.any()


def test_paste_half_prob_thresholded():
    prob = np.zeros((28, 28), np.float32)
    prob[:, :14] = 0.9  # left half confident, right half zero
    x0, y0, bm = paste_mask_in_box(prob, np.array([0, 0, 56, 56]), 64, 64)
    full = window_to_full((x0, y0, bm), 64, 64)
    assert full[5:50, 5:24].all()  # left interior on
    assert not full[:, 34:].any()  # right half off


# ---------------------------------------------------------------- windows


def test_window_roundtrip():
    m = np.zeros((20, 30), np.uint8)
    m[4:9, 10:17] = 1
    win = full_to_window(m)
    assert win[:2] == (10, 4)
    np.testing.assert_array_equal(window_to_full(win, 20, 30), m)


def test_encode_rle_roundtrip():
    m = np.zeros((13, 9), np.uint8)
    m[2:7, 3:8] = 1
    m[0, 0] = 1  # exercise leading-1 (zero-length first run)
    rle = encode_rle(full_to_window(m), 13, 9)
    np.testing.assert_array_equal(rle_to_mask(rle["counts"], rle["size"]), m)


# ------------------------------------------------------------------- IoU


def _win(x0, y0, h, w):
    return (x0, y0, np.ones((h, w), np.uint8))


def test_mask_iou_hand_cases():
    # identical 10x10 -> 1.0; disjoint -> 0; half-overlap 10x10 vs
    # shifted by 5 -> 50/150 = 1/3
    dt = [_win(0, 0, 10, 10), _win(5, 0, 10, 10)]
    gt = [_win(0, 0, 10, 10), _win(40, 40, 10, 10)]
    iou = mask_iou(dt, gt, np.array([False, False]))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[1, 0], 50 / 150)
    np.testing.assert_allclose(iou[:, 1], 0.0)


def test_mask_iou_crowd_uses_det_area():
    dt = [_win(0, 0, 10, 10)]
    gt = [_win(0, 0, 20, 20)]
    np.testing.assert_allclose(
        mask_iou(dt, gt, np.array([True]))[0, 0], 1.0
    )  # inter / det-area
    np.testing.assert_allclose(
        mask_iou(dt, gt, np.array([False]))[0, 0], 100 / 400
    )


def test_mask_iou_empty_window():
    empty = (0, 0, np.zeros((0, 0), np.uint8))
    iou = mask_iou([empty], [_win(0, 0, 4, 4)], np.array([False]))
    np.testing.assert_allclose(iou, 0.0)


# ------------------------------------------------------------ segm COCO


def _rect_poly(x, y, w, h):
    return [[x, y, x + w, y, x + w, y + h, x, y + h]]


def _gt_two_images():
    return {
        "images": [
            {"id": 1, "width": 64, "height": 64},
            {"id": 2, "width": 64, "height": 64},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [4, 4, 20, 12], "area": 240, "iscrowd": 0,
             "segmentation": _rect_poly(4, 4, 20, 12)},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [30, 30, 16, 16], "area": 256, "iscrowd": 0,
             "segmentation": _rect_poly(30, 30, 16, 16)},
            {"id": 3, "image_id": 2, "category_id": 1,
             "bbox": [8, 8, 24, 24], "area": 576, "iscrowd": 0,
             "segmentation": _rect_poly(8, 8, 24, 24)},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }


def _perfect_predictions(gt):
    return [
        {
            "image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": list(a["bbox"]), "score": 0.9,
            "segmentation": a["segmentation"],
        }
        for a in gt["annotations"]
    ]


def test_segm_eval_perfect_predictions():
    gt = _gt_two_images()
    ev = CocoEvaluator(gt, iou_type="segm")
    m = ev.evaluate(_perfect_predictions(gt))
    assert m["mAP"] == 1.0 and m["AP50"] == 1.0


def test_segm_eval_detects_mask_quality_not_just_boxes():
    # same boxes, but the predicted mask only covers the left half of
    # each GT rectangle: bbox eval would stay perfect, segm must drop
    # (IoU 0.5 kills the >=0.55 thresholds but keeps AP50)
    gt = _gt_two_images()
    preds = []
    for a in gt["annotations"]:
        x, y, w, h = a["bbox"]
        preds.append({
            "image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": [x, y, w, h], "score": 0.9,
            "segmentation": _rect_poly(x, y, w / 2, h),
        })
    bbox_m = CocoEvaluator(gt, iou_type="bbox").evaluate(preds)
    segm_m = CocoEvaluator(gt, iou_type="segm").evaluate(preds)
    assert bbox_m["mAP"] == 1.0
    assert segm_m["AP50"] == 1.0  # half-overlap IoU ~0.5... PIL edge fill
    assert segm_m["mAP"] < 0.6


def test_segm_eval_accepts_window_fast_path():
    # the evaluator's in-memory predictions carry (x0, y0, bitmap)
    # windows instead of RLE/polygons — same result either way
    gt = _gt_two_images()
    preds = _perfect_predictions(gt)
    from layoutdit_tpu.data.masks import rasterize_fullsize
    from layoutdit_tpu.eval.masks import full_to_window

    win_preds = []
    for p in preds:
        q = dict(p)
        q["segmentation"] = full_to_window(
            rasterize_fullsize(p["segmentation"], 64, 64)
        )
        win_preds.append(q)
    m = CocoEvaluator(gt, iou_type="segm").evaluate(win_preds)
    assert m["mAP"] == 1.0


def test_segm_eval_rle_gt():
    # GT segmentation as uncompressed RLE instead of polygons
    gt = _gt_two_images()
    for a in gt["annotations"]:
        x, y, w, h = (int(v) for v in a["bbox"])
        m = np.zeros((64, 64), np.uint8)
        m[y:y + h, x:x + w] = 1
        from layoutdit_tpu.eval.masks import encode_rle, full_to_window

        a["segmentation"] = encode_rle(full_to_window(m), 64, 64)
    preds = []
    for a in gt["annotations"]:
        x, y, w, h = a["bbox"]
        preds.append({
            "image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": [x, y, w, h], "score": 0.9,
            "segmentation": dict(a["segmentation"]),
        })
    m = CocoEvaluator(gt, iou_type="segm").evaluate(preds)
    assert m["mAP"] == 1.0
