"""Tests for the numpy COCOeval reimplementation against hand-computed
cases (pycocotools is unavailable in this environment)."""

import numpy as np

from layoutdit_tpu.eval.coco_eval import COCO_KEYS, CocoEvaluator, _iou_xywh


def _gt(image_id, cat, bbox, ann_id, iscrowd=0):
    return {"id": ann_id, "image_id": image_id, "category_id": cat,
            "bbox": bbox, "area": bbox[2] * bbox[3], "iscrowd": iscrowd}


def _coco(annotations, n_images=2, cats=(1, 2)):
    return {
        "images": [{"id": i + 1, "width": 224, "height": 224}
                   for i in range(n_images)],
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }


def test_iou_xywh():
    dt = np.array([[0, 0, 10, 10]], float)
    gt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    iou = _iou_xywh(dt, gt, np.zeros(2))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0])


def test_perfect_predictions_give_ap_1():
    anns = [_gt(1, 1, [10, 10, 50, 60], 1), _gt(1, 2, [100, 100, 40, 40], 2),
            _gt(2, 1, [20, 30, 80, 50], 3)]
    ev = CocoEvaluator(_coco(anns))
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [100, 100, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [20, 30, 80, 50], "score": 0.95},
    ]
    m = ev.evaluate(preds)
    assert set(m) == set(COCO_KEYS)
    assert m["mAP"] == 1.0
    assert m["AP50"] == 1.0
    assert m["AR100"] == 1.0


def test_no_predictions_gives_zero():
    anns = [_gt(1, 1, [10, 10, 50, 60], 1)]
    m = CocoEvaluator(_coco(anns)).evaluate([])
    assert m["mAP"] == 0.0
    assert m["AR100"] == 0.0


def test_half_iou_counts_only_at_loose_thresholds():
    # pred IoU with gt = 0.5: counts for t=0.5 but not t>0.5
    anns = [_gt(1, 1, [0, 0, 10, 20], 1)]
    preds = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
              "score": 0.9}]  # IoU = 100/200 = 0.5
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    assert m["AP50"] == 1.0
    assert m["AP75"] == 0.0
    assert abs(m["mAP"] - 0.1) < 1e-6  # 1 of 10 thresholds


def test_false_positive_lowers_precision():
    anns = [_gt(1, 1, [10, 10, 50, 60], 1)]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [150, 150, 50, 60], "score": 0.9},
    ]
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    # FP ranked above the TP: interpolated precision = 0.5 at every recall
    assert abs(m["AP50"] - 0.5) < 1e-6
    assert m["AR100"] == 1.0


def test_duplicate_detection_is_fp():
    anns = [_gt(1, 1, [10, 10, 50, 60], 1)]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.8},
    ]
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    assert m["AP50"] == 1.0  # dup ranked after the TP doesn't hurt AP


def test_area_ranges():
    # small gt (20x20=400 < 1024), large gt (100x100)
    anns = [_gt(1, 1, [0, 0, 20, 20], 1), _gt(1, 1, [50, 50, 100, 100], 2)]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 100, 100], "score": 0.8},
    ]
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    assert m["AP_s"] == 1.0
    assert m["AP_l"] == 1.0
    assert m["AP_m"] == -1.0  # no medium gt -> undefined


def test_ar1_caps_detections():
    anns = [_gt(1, 1, [0, 0, 20, 20], 1), _gt(1, 1, [100, 100, 20, 20], 2)]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 20, 20], "score": 0.8},
    ]
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    assert abs(m["AR1"] - 0.5) < 1e-6  # only 1 det allowed -> recall 0.5
    assert m["AR10"] == 1.0


def test_crowd_gt_ignored():
    anns = [_gt(1, 1, [0, 0, 50, 50], 1, iscrowd=1),
            _gt(1, 1, [100, 100, 50, 50], 2)]
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 50, 50], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 50, 50], "score": 0.8},
    ]
    m = CocoEvaluator(_coco(anns, cats=(1,))).evaluate(preds)
    # crowd match is ignored (neither TP nor FP); real gt matched -> AP 1
    assert m["AP50"] == 1.0


def _random_case(rng, n_gt, n_dt, crowd_p=0.15):
    """Random boxes clustered so overlaps (incl. exact ties) are common."""
    def boxes(n):
        xy = rng.integers(0, 6, (n, 2)) * 10.0
        wh = rng.integers(1, 5, (n, 2)) * 10.0
        return np.concatenate([xy, wh], axis=1)

    gt = [
        {"id": i + 1, "bbox": list(b), "area": b[2] * b[3],
         "iscrowd": int(rng.uniform() < crowd_p)}
        for i, b in enumerate(boxes(n_gt))
    ]
    # quantized scores force duplicate-score ties through the stable sorts
    dt = [
        {"bbox": list(b), "score": round(float(rng.uniform()), 1)}
        for b in boxes(n_dt)
    ]
    return gt, dt


def test_vectorized_match_equals_scalar_oracle():
    """_match_pairs (production, batched+vectorized) vs _match_img_ref
    (literal COCOeval.evaluateImg transcription) on randomized adversarial
    cases: crowds, ignored-area gt, score ties, duplicate boxes, empty
    sides, mixed bucket sizes in one batch."""
    from layoutdit_tpu.eval.coco_eval import AREA_RNGS, _Pair

    rng = np.random.default_rng(0)
    shapes = [(0, 5), (5, 0), (1, 1), (4, 8), (12, 25), (30, 130), (0, 0)]
    cases = [_random_case(rng, n_gt, n_dt)
             for n_gt, n_dt in shapes for _ in range(8)]
    pairs = [_Pair(gt, dt, max_det=100) for gt, dt in cases]
    for rng_name, area_rng in AREA_RNGS.items():
        got_all = CocoEvaluator._match_pairs(pairs, area_rng)
        for (gt, dt), got in zip(cases, got_all):
            want = CocoEvaluator._match_img_ref(gt, dt, area_rng, 100)
            for k in ("dtm", "dt_ig", "scores"):
                np.testing.assert_array_equal(
                    got[k], want[k],
                    err_msg=f"{k} gt={len(gt)} dt={len(dt)} area={rng_name}",
                )
            assert got["n_gt"] == want["n_gt"]


def test_eval_throughput_10k_images():
    """VERDICT.md round-1 item 5: 10k images with predictions must score
    in well under 60s (pycocotools-class speed)."""
    import time

    rng = np.random.default_rng(1)
    n_img, cats = 10_000, (1, 2, 3, 4, 5)
    anns, preds = [], []
    aid = 0
    for img in range(1, n_img + 1):
        for _ in range(8):  # ~PubLayNet density
            cat = int(rng.integers(1, 6))
            b = [float(rng.integers(0, 180)), float(rng.integers(0, 180)),
                 float(rng.integers(5, 40)), float(rng.integers(5, 40))]
            aid += 1
            anns.append({"id": aid, "image_id": img, "category_id": cat,
                         "bbox": b, "area": b[2] * b[3], "iscrowd": 0})
            # jittered prediction + one noise det
            jb = [b[0] + 1, b[1] + 1, b[2], b[3]]
            preds.append({"image_id": img, "category_id": cat, "bbox": jb,
                          "score": float(rng.uniform(0.5, 1.0))})
        preds.append({"image_id": img, "category_id": int(rng.integers(1, 6)),
                      "bbox": [0.0, 0.0, 10.0, 10.0],
                      "score": float(rng.uniform(0.0, 0.5))})

    coco = {
        "images": [{"id": i, "width": 224, "height": 224}
                   for i in range(1, n_img + 1)],
        "annotations": anns,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }
    t0 = time.time()
    ev = CocoEvaluator(coco)
    m = ev.evaluate(preds)
    dt = time.time() - t0
    assert 0.3 < m["mAP"] <= 1.0
    assert dt < 60, f"10k-image eval took {dt:.1f}s"


def test_per_category_breakdown():
    # cat "text": perfect match -> AP 1.0; cat "table": missed -> AP 0.0;
    # the aggregate mAP averages the two. Mirrors how PubLayNet papers
    # report per-class AP (a breakdown the reference never surfaces).
    gt = {
        "images": [{"id": 1, "width": 224, "height": 224}],
        "annotations": [_gt(1, 1, [10, 10, 50, 60], 1),
                        _gt(1, 2, [100, 100, 40, 40], 2)],
        "categories": [{"id": 1, "name": "text"}, {"id": 2, "name": "table"}],
    }
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.9},
    ]
    ev = CocoEvaluator(gt)
    m12 = ev.evaluate(preds)
    assert set(m12) == set(COCO_KEYS)  # off by default

    m = ev.evaluate(preds, per_category=True)
    assert m["AP-text"] == 1.0 and m["AP50-text"] == 1.0
    assert m["AP-table"] == 0.0 and m["AP50-table"] == 0.0
    assert abs(m["mAP"] - 0.5) < 1e-6
    # aggregate keys are untouched by the breakdown
    for k in COCO_KEYS:
        assert m[k] == m12[k]


def test_per_category_unlabeled_class_is_minus_one():
    # a category with no gt anywhere stays -1 (COCO convention), and is
    # excluded from the aggregate mean, matching _ap()'s p > -1 filter
    gt = {
        "images": [{"id": 1, "width": 224, "height": 224}],
        "annotations": [_gt(1, 1, [10, 10, 50, 60], 1)],
        "categories": [{"id": 1, "name": "text"}, {"id": 2, "name": "figure"}],
    }
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 60], "score": 0.9},
    ]
    m = CocoEvaluator(gt).evaluate(preds, per_category=True)
    assert m["AP-text"] == 1.0
    assert m["AP-figure"] == -1.0 and m["AP50-figure"] == -1.0
    assert m["mAP"] == 1.0
