"""Independent protocol oracle for eval/coco_eval.py (VERDICT r3 #5).

pycocotools cannot be installed in this environment, and the existing
differential oracle (``_match_img_ref``) lives in the same module as the
production code, so a shared misunderstanding could pass both. This file
holds a SECOND, fully independent evaluator — ``_protocol_eval`` — written
as a deliberately naive scalar transcription of the published pycocotools
protocol (cocoeval.py: evaluateImg greedy matching, accumulate's
envelope + 101-point interpolation, the 12-metric summarize table),
sharing no code, no helper, and no structure with ``eval/coco_eval.py``
(nested dict-of-loops here vs bucketed vectorized arrays there).
Disclosure: it is a transcription of torchvision/pycocotools *semantics*
by the same author — true third-party goldens would need pycocotools
itself — but the two implementations were derived along different paths,
so any protocol corner one of them gets wrong (crowd re-matching, the
ignored-gt break rule, area-vs-bbox ignore classification, envelope
interpolation at searchsorted boundaries, maxDets capping) fails the
comparison.

The fuzz cases are built to hit exactly the corners the r3 verdict called
out: crowd/ignore/area interactions at scale, score ties through stable
sorts, gt ``area`` fields that disagree with bbox w*h (segmentation-style
areas drive ignore classification; IoU stays bbox-based), >100 detections
per (image, cat) to engage maxDets, and empty images/categories.
"""

import numpy as np
import pytest

from layoutdit_tpu.eval.coco_eval import COCO_KEYS, CocoEvaluator

# protocol constants, restated here on purpose (not imported): a typo in
# the production constants must fail this file, not propagate into it.
# They MUST be np.linspace, exactly as pycocotools builds them: the 101
# recall thresholds feed a searchsorted against exact tp/npig ratios, and
# linspace's 0.7000000000000001 lands on the other side of an exact 0.7
# recall than the naive 70/100 (this very test caught that one-ulp
# difference as a 6.6e-5 AP_m error).
T_IOU = list(np.linspace(0.5, 0.95, 10))
R_REC = list(np.linspace(0.0, 1.0, 101))
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 1024.0),
    "medium": (1024.0, 9216.0),
    "large": (9216.0, 1e10),
}


def _protocol_match(gts, dts, area_lo, area_hi, max_det):
    """COCOeval.evaluateImg, scalar and literal, for one (image, cat)."""
    if not gts and not dts:
        return None
    # gt ignore: crowd or the *annotation's* area field outside the range
    for g in gts:
        g["_ig"] = 1 if (g.get("iscrowd", 0) or g["area"] < area_lo
                         or g["area"] > area_hi) else 0
    # gt sorted ignore-last (stable); dt sorted score-desc (stable), capped
    gts = sorted(gts, key=lambda g: g["_ig"])
    dts = sorted(dts, key=lambda d: -d["score"])[:max_det]

    def iou(d, g):
        dx, dy, dw, dh = d["bbox"]
        gx, gy, gw, gh = g["bbox"]
        iw = min(dx + dw, gx + gw) - max(dx, gx)
        ih = min(dy + dh, gy + gh) - max(dy, gy)
        if iw <= 0 or ih <= 0:
            return 0.0
        inter = iw * ih
        u = dw * dh if g.get("iscrowd", 0) else dw * dh + gw * gh - inter
        return inter / u if u > 0 else 0.0

    T, D, G = len(T_IOU), len(dts), len(gts)
    gtm = [[0] * G for _ in range(T)]
    dtm = [[0] * D for _ in range(T)]
    dt_ig = [[0] * D for _ in range(T)]
    for ti, t in enumerate(T_IOU):
        for di, d in enumerate(dts):
            best, m = min(t, 1 - 1e-10), -1
            for gi, g in enumerate(gts):
                # already claimed, and not a (re-matchable) crowd
                if gtm[ti][gi] > 0 and not g.get("iscrowd", 0):
                    continue
                # gts sorted ignore-last: once we hold a real match and
                # reach the ignore region, stop
                if m > -1 and gts[m]["_ig"] == 0 and g["_ig"] == 1:
                    break
                v = iou(d, g)
                if v < best:
                    continue
                best, m = v, gi
            if m == -1:
                continue
            dt_ig[ti][di] = gts[m]["_ig"]
            dtm[ti][di] = gts[m]["id"]
            gtm[ti][m] = 1  # any nonzero claim marker
    # unmatched dts whose bbox area is outside the range are ignored too
    for di, d in enumerate(dts):
        a = d["bbox"][2] * d["bbox"][3]
        if a < area_lo or a > area_hi:
            for ti in range(T):
                if dtm[ti][di] == 0:
                    dt_ig[ti][di] = 1
    return {
        "scores": [d["score"] for d in dts],
        "dtm": dtm,
        "dt_ig": dt_ig,
        "n_gt": sum(1 for g in gts if g["_ig"] == 0),
    }


def _protocol_eval(coco_gt, preds, per_category=False):
    """The full 12-metric table, naive-and-literal (COCOeval.accumulate +
    summarize). Image ids are iterated in the order given in
    coco_gt['images'] (callers keep them ascending, matching
    pycocotools' sorted imgIds)."""
    img_ids = [im["id"] for im in coco_gt["images"]]
    cat_ids = [c["id"] for c in coco_gt["categories"]]
    gt_by = {(i, c): [] for i in img_ids for c in cat_ids}
    for a in coco_gt["annotations"]:
        if (a["image_id"], a["category_id"]) in gt_by:
            gt_by[(a["image_id"], a["category_id"])].append(dict(a))
    dt_by = {(i, c): [] for i in img_ids for c in cat_ids}
    for d in preds:
        if (d["image_id"], d["category_id"]) in dt_by:
            dt_by[(d["image_id"], d["category_id"])].append(dict(d))

    T, R = len(T_IOU), len(R_REC)
    # precision[T][R][cat][area][maxdet], recall[T][cat][area][maxdet]
    area_names = list(AREAS)
    max_dets = [1, 10, 100]
    prec = np.full((T, R, len(cat_ids), len(area_names), len(max_dets)), -1.0)
    rec = np.full((T, len(cat_ids), len(area_names), len(max_dets)), -1.0)

    for ci, cat in enumerate(cat_ids):
        for ai, an in enumerate(area_names):
            lo, hi = AREAS[an]
            # evaluateImg is run at the LARGEST maxDet; smaller caps
            # re-slice its per-image results (pycocotools accumulate)
            per_img = [
                _protocol_match(
                    [dict(g) for g in gt_by[(i, cat)]],
                    [dict(d) for d in dt_by[(i, cat)]], lo, hi, max_dets[-1],
                )
                for i in img_ids
            ]
            per_img = [e for e in per_img if e is not None]
            for mi, md in enumerate(max_dets):
                scores, dtm_cols, dtig_cols = [], [], []
                npig = 0
                for e in per_img:
                    scores += e["scores"][:md]
                    dtm_cols.append([row[:md] for row in e["dtm"]])
                    dtig_cols.append([row[:md] for row in e["dt_ig"]])
                    npig += e["n_gt"]
                if npig == 0:
                    continue
                order = np.argsort(
                    -np.array(scores if scores else [0.0]), kind="mergesort"
                ) if scores else np.array([], int)
                dtm = np.array(
                    [sum((c[ti] for c in dtm_cols), []) for ti in range(T)],
                    dtype=float,
                ).reshape(T, -1)[:, order]
                dtig = np.array(
                    [sum((c[ti] for c in dtig_cols), []) for ti in range(T)],
                    dtype=float,
                ).reshape(T, -1)[:, order]
                tps = (dtm > 0) & (dtig == 0)
                fps = (dtm == 0) & (dtig == 0)
                for ti in range(T):
                    tp = np.cumsum(tps[ti]).astype(float)
                    fp = np.cumsum(fps[ti]).astype(float)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (tp + fp + np.spacing(1))
                    rec[ti, ci, ai, mi] = rc[-1] if nd else 0.0
                    pr = pr.tolist()
                    q = [0.0] * R
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, R_REC, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    prec[ti, :, ci, ai, mi] = q

    def _mean(s):
        s = s[s > -1]
        return float(np.mean(s)) if len(s) else -1.0

    a_all, md100 = 0, 2
    out = {
        "mAP": _mean(prec[:, :, :, a_all, md100]),
        "AP50": _mean(prec[0, :, :, a_all, md100]),
        "AP75": _mean(prec[5, :, :, a_all, md100]),
        "AP_s": _mean(prec[:, :, :, 1, md100]),
        "AP_m": _mean(prec[:, :, :, 2, md100]),
        "AP_l": _mean(prec[:, :, :, 3, md100]),
        "AR1": _mean(rec[:, :, a_all, 0]),
        "AR10": _mean(rec[:, :, a_all, 1]),
        "AR100": _mean(rec[:, :, a_all, md100]),
        "AR_s": _mean(rec[:, :, 1, md100]),
        "AR_m": _mean(rec[:, :, 2, md100]),
        "AR_l": _mean(rec[:, :, 3, md100]),
    }
    if per_category:
        names = {c["id"]: str(c.get("name", c["id"]))
                 for c in coco_gt["categories"]}
        for ci, cat in enumerate(cat_ids):
            out[f"AP-{names[cat]}"] = _mean(prec[:, :, ci, a_all, md100])
            out[f"AP50-{names[cat]}"] = _mean(prec[0, :, ci, a_all, md100])
    return out


# ------------------------------------------------------------------ fuzz

def _fuzz_case(rng, n_img, cats, crowd_p, dense=False):
    """Adversarial corpus: clustered boxes (overlaps + exact-tie IoUs),
    quantized scores (sort ties), crowds, gt areas decoupled from bbox
    w*h and straddling the 32^2/96^2 boundaries, some empty images."""
    images = [{"id": i + 1, "width": 640, "height": 640}
              for i in range(n_img)]
    anns, preds, aid = [], [], 0

    def boxes(n, big):
        xy = rng.integers(0, 12, (n, 2)) * 16.0
        wh = rng.integers(1, 10 if big else 4, (n, 2)) * 16.0
        return np.concatenate([xy, wh], axis=1)

    for img in range(1, n_img + 1):
        if rng.uniform() < 0.15:
            continue  # empty image: no gt (dets may still land here)
        for cat in cats:
            n_gt = int(rng.integers(0, 5))
            for b in boxes(n_gt, big=True):
                aid += 1
                area = float(b[2] * b[3])
                if rng.uniform() < 0.3:
                    # segmentation-style area disagreeing with bbox w*h,
                    # nudged across an s/m/l boundary
                    area = float(rng.choice([1023.9, 1024.0, 9216.0, 9216.1]))
                anns.append({
                    "id": aid, "image_id": img, "category_id": int(cat),
                    "bbox": [float(v) for v in b], "area": area,
                    "iscrowd": int(rng.uniform() < crowd_p),
                })
            n_dt = int(rng.integers(0, 140 if dense else 8))
            for b in boxes(n_dt, big=True):
                preds.append({
                    "image_id": img, "category_id": int(cat),
                    "bbox": [float(v) for v in b],
                    "score": round(float(rng.uniform()), 1),
                })
            # jittered true positives (sometimes duplicated) so greedy
            # matching, crowd re-matching and dup-FP handling run dense
            for a in anns[-n_gt:] if n_gt else []:
                for _ in range(int(rng.integers(0, 3))):
                    j = rng.integers(-8, 9, 2)
                    bb = [a["bbox"][0] + j[0], a["bbox"][1] + j[1],
                          a["bbox"][2], a["bbox"][3]]
                    preds.append({
                        "image_id": img, "category_id": int(cat),
                        "bbox": [float(v) for v in bb],
                        "score": round(float(rng.uniform()), 1),
                    })
    coco = {"images": images, "annotations": anns,
            "categories": [{"id": int(c), "name": f"c{c}"} for c in cats]}
    return coco, preds


@pytest.mark.parametrize("seed,n_img,cats,crowd_p,dense", [
    (0, 10, (1, 2, 3), 0.2, False),
    (1, 6, (1,), 0.5, False),      # crowd-heavy
    (2, 4, (1, 2), 0.0, True),     # >100 dets/(img,cat): maxDets capping
    (3, 16, (1, 2, 3, 4, 5), 0.15, False),  # PubLayNet-shaped
])
def test_full_metrics_match_independent_protocol_oracle(
    seed, n_img, cats, crowd_p, dense
):
    rng = np.random.default_rng(seed)
    coco, preds = _fuzz_case(rng, n_img, cats, crowd_p, dense)
    got = CocoEvaluator(coco).evaluate(preds, per_category=True)
    want = _protocol_eval(coco, preds, per_category=True)
    assert set(want) <= set(got)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-12, err_msg=k)


def test_hand_computed_crowd_area_interaction():
    """Fully hand-derived corner: a crowd gt, an area-ignored gt (its
    ``area`` field is small even though its bbox is large), and one real
    medium gt, with three detections.

    Derivation for the 'all' range, maxDet=100, IoU threshold sweep:
      gt1: bbox 40x40 @ (0,0),   area field 100 (ignored in s only: 100<1024
           -> SMALL;  in 'all' it is NOT ignored)  ... but see below
      gt2: crowd, bbox 50x50 @ (200,200)
      gt3: bbox 60x60 @ (400,400), area 3600 (medium)
      dt A: exactly gt1's bbox, score .9 -> IoU 1.0, TP at all 10 thrs
      dt B: exactly gt2's bbox, score .8 -> matches the crowd -> IGNORED
      dt C: 30x60 @ (400,400), score .7 -> IoU with gt3 = 1800/3600 = .5
            TP at t=.5 only
      per-threshold (cat has 2 non-ignored gt):
        t=.50: tps = [A, C]      -> P(1)=1, rc .5 ; P(2)=1, rc 1   AP=1
        t>=.55: tps=[A], C is FP -> rc .5 at P=1; beyond: P=.5
               101-pt: q=1 for r<=0.5, q=0 above -> AP = 51/101
      mAP = (1*1 + 9*(51/101)) / 10
    """
    coco = {
        "images": [{"id": 1, "width": 640, "height": 640}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 40, 40], "area": 1600, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [200, 200, 50, 50], "area": 2500, "iscrowd": 1},
            {"id": 3, "image_id": 1, "category_id": 1,
             "bbox": [400, 400, 60, 60], "area": 3600, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "text"}],
    }
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [200, 200, 50, 50], "score": 0.8},
        {"image_id": 1, "category_id": 1, "bbox": [400, 400, 30, 60], "score": 0.7},
    ]
    want_map = (1.0 + 9 * (51 / 101)) / 10
    got = CocoEvaluator(coco).evaluate(preds)
    oracle = _protocol_eval(coco, preds)
    np.testing.assert_allclose(got["mAP"], want_map, atol=1e-12)
    np.testing.assert_allclose(oracle["mAP"], want_map, atol=1e-12)
    np.testing.assert_allclose(got["AP50"], 1.0, atol=1e-12)
    # both gts are medium (1600, 3600 in (1024, 9216)); crowd ignored
    np.testing.assert_allclose(got["AP_m"], want_map, atol=1e-12)
    assert got["AP_s"] == -1.0 and got["AP_l"] == -1.0
    # AR100 at t=.5: 2/2; at t>=.55: 1/2 -> mean = (1 + 9*.5)/10
    np.testing.assert_allclose(got["AR100"], (1 + 9 * 0.5) / 10, atol=1e-12)
    for k in COCO_KEYS:
        np.testing.assert_allclose(got[k], oracle[k], atol=1e-12, err_msg=k)


def test_hand_computed_ignored_gt_break_rule():
    """A det overlapping BOTH a real gt (lower IoU) and an ignored gt
    (higher IoU): pycocotools prefers the real match because ignored gts
    sort last and the loop breaks at the first ignored gt once a real
    candidate is held — the det must count as a TP, not be ignored.
      gt1 real:    [0,0,100,100]
      gt2 ignored: [0,0,120,120] with area field 100 -> small-only;
                   evaluate at area range 'large' (gt1 area field 10000)
      ... simpler: use 'all' with iscrowd for the ignored gt.
      dt: [0,0,110,110], score .9
        IoU(real) = 100^2/(110^2+100^2-100^2) = 10000/12100 = .8264
        IoU(crowd) = inter/dtArea = 110*110-capped -> 12100/12100 = 1? No:
        inter with gt2 = 110x110 ^ 120x120 = 110*110 = 12100; crowd IoU =
        12100/12100 = 1.0 > .8264.
    At t=.5: the loop sees gt1 (real, .8264 >= .5, hold m=gt1), then gt2 is
    ignored -> break. TP against gt1 despite the crowd's higher IoU.
    """
    coco = {
        "images": [{"id": 1, "width": 640, "height": 640}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 100, 100], "area": 10000, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 120, 120], "area": 14400, "iscrowd": 1},
        ],
        "categories": [{"id": 1, "name": "text"}],
    }
    preds = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 110, 110],
              "score": 0.9}]
    got = CocoEvaluator(coco).evaluate(preds)
    oracle = _protocol_eval(coco, preds)
    # IoU .8264 -> TP for t in {.5,...,.8}=7 thresholds, FP above
    want = 7 / 10
    np.testing.assert_allclose(got["mAP"], want, atol=1e-12)
    np.testing.assert_allclose(oracle["mAP"], want, atol=1e-12)
    for k in COCO_KEYS:
        np.testing.assert_allclose(got[k], oracle[k], atol=1e-12, err_msg=k)
