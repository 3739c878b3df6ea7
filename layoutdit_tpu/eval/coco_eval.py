"""COCO-style bbox mAP evaluation in pure numpy.

The reference scores with pycocotools' COCOeval (evaluator.py:266-286);
that Cython package is not available here, so this is a faithful
reimplementation of the COCOeval bbox protocol: greedy per-image matching
over 10 IoU thresholds (0.50:0.05:0.95), ignore handling for crowd /
area-range, 101-point interpolated precision, and the standard 12-metric
summary. Offline host-side scoring — not on the TPU hot path (SURVEY.md
§2.2).

Returns the same 12 keys the reference's Evaluator.score() returns
(evaluator.py:272-286).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)

COCO_KEYS = [
    "mAP", "AP50", "AP75", "AP_s", "AP_m", "AP_l",
    "AR1", "AR10", "AR100", "AR_s", "AR_m", "AR_l",
]


def _iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """pycocotools maskUtils.iou for bbox: [D, G]; crowd gt use
    intersection / det-area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    ix = np.maximum(
        0.0,
        np.minimum(dx2[:, None], gx2[None]) - np.maximum(dt[:, 0][:, None], gt[:, 0][None]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(dy2[:, None], gy2[None]) - np.maximum(dt[:, 1][:, None], gt[:, 1][None]),
    )
    inter = ix * iy
    d_area = (dt[:, 2] * dt[:, 3])[:, None]
    g_area = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), d_area, d_area + g_area - inter)
    return np.where(union > 0, inter / union, 0.0)


class CocoEvaluator:
    """Evaluate COCO-format predictions against COCO-format ground truth.

    gt: the raw ``coco_data`` dict (images/annotations/categories) that the
    dataset caches (reference publay_dataset.py:25, evaluator.py:51-62).
    """

    def __init__(self, coco_gt: dict):
        self.cat_ids = [c["id"] for c in coco_gt["categories"]]
        self.img_ids = [im["id"] for im in coco_gt["images"]]
        self._gt: dict[tuple, list] = {
            (i, c): [] for i in self.img_ids for c in self.cat_ids
        }
        for ann in coco_gt["annotations"]:
            key = (ann["image_id"], ann["category_id"])
            if key in self._gt:
                self._gt[key].append(ann)

    # ------------------------------------------------------------ matching

    @staticmethod
    def _match_img(gt: list, dt: list, area_rng, max_det: int) -> dict:
        """COCOeval.evaluateImg: greedy matching at every IoU threshold."""
        gt_ignore = np.array(
            [
                bool(g.get("iscrowd", 0))
                or not (
                    # pycocotools gates with INCLUSIVE bounds (ignore only
                    # when area < lo or area > hi)
                    area_rng[0]
                    <= g.get("area", g["bbox"][2] * g["bbox"][3])
                    <= area_rng[1]
                )
                for g in gt
            ],
            bool,
        )
        # non-ignored gt first (stable), as COCOeval sorts by _ignore
        g_order = np.argsort(gt_ignore, kind="stable")
        gt = [gt[i] for i in g_order]
        gt_ignore = gt_ignore[g_order]
        iscrowd = np.array([int(g.get("iscrowd", 0)) for g in gt])

        d_order = np.argsort([-d["score"] for d in dt], kind="stable")[:max_det]
        dt = [dt[i] for i in d_order]

        g_boxes = np.array([g["bbox"] for g in gt], float).reshape(-1, 4)
        d_boxes = np.array([d["bbox"] for d in dt], float).reshape(-1, 4)
        ious = _iou_xywh(d_boxes, g_boxes, iscrowd)

        t_n = len(IOU_THRS)
        dtm = np.zeros((t_n, len(dt)), dtype=np.int64)
        gtm = np.zeros((t_n, len(gt)), dtype=np.int64)
        dt_ig = np.zeros((t_n, len(dt)), bool)
        for ti, t in enumerate(IOU_THRS):
            for di in range(len(dt)):
                best_iou = min(t, 1 - 1e-10)
                m = -1
                for gi in range(len(gt)):
                    # gt already matched (crowd may match many)
                    if gtm[ti, gi] > 0 and not iscrowd[gi]:
                        continue
                    # past non-ignored gt and into ignored ones: stop
                    if m > -1 and not gt_ignore[m] and gt_ignore[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = gt_ignore[m]
                dtm[ti, di] = m + 1
                gtm[ti, m] = di + 1
        # unmatched dets outside the area range are ignored
        d_out = np.array(
            [
                not (area_rng[0] <= d["bbox"][2] * d["bbox"][3] <= area_rng[1])
                for d in dt
            ],
            bool,
        ).reshape(1, -1)
        dt_ig = dt_ig | ((dtm == 0) & d_out)
        return {
            "dtm": dtm,
            "dt_ig": dt_ig,
            "scores": np.array([d["score"] for d in dt], float),
            "n_gt": int((~gt_ignore).sum()),
        }

    @staticmethod
    def _accumulate(per_img: list[dict], max_det: int):
        """COCOeval.accumulate for one (cat, area, maxDet):
        -> (precision [T, R], recall [T]) or None if no gt."""
        npig = sum(e["n_gt"] for e in per_img)
        if npig == 0:
            return None
        dtm = np.concatenate([e["dtm"][:, :max_det] for e in per_img], axis=1)
        dt_ig = np.concatenate([e["dt_ig"][:, :max_det] for e in per_img], axis=1)
        scores = np.concatenate([e["scores"][:max_det] for e in per_img])
        order = np.argsort(-scores, kind="mergesort")
        dtm, dt_ig = dtm[:, order], dt_ig[:, order]

        tps = (dtm > 0) & ~dt_ig
        fps = (dtm == 0) & ~dt_ig
        tp_sum = np.cumsum(tps, axis=1).astype(float)
        fp_sum = np.cumsum(fps, axis=1).astype(float)

        t_n, r_n = len(IOU_THRS), len(REC_THRS)
        prec_out = np.zeros((t_n, r_n))
        rec_out = np.zeros((t_n,))
        for ti in range(t_n):
            tp, fp = tp_sum[ti], fp_sum[ti]
            rc = tp / npig
            pr = tp / np.maximum(tp + fp, np.spacing(1))
            rec_out[ti] = rc[-1] if len(rc) else 0.0
            # precision envelope (monotone non-increasing from the right)
            pr = pr.tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, REC_THRS, side="left")
            q = np.zeros(r_n)
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            prec_out[ti] = q
        return prec_out, rec_out

    # ----------------------------------------------------------- interface

    def evaluate(self, predictions: list[dict]) -> dict[str, float]:
        """predictions: [{image_id, category_id, bbox [x,y,w,h], score}]
        -> the 12 standard COCO metrics."""
        dt: dict[tuple, list] = {k: [] for k in self._gt}
        for p in predictions:
            key = (p["image_id"], p["category_id"])
            if key in dt:
                dt[key].append(p)

        t_n, r_n = len(IOU_THRS), len(REC_THRS)
        a_names = list(AREA_RNGS)
        precision = -np.ones(
            (t_n, r_n, len(self.cat_ids), len(a_names), len(MAX_DETS))
        )
        recall = -np.ones((t_n, len(self.cat_ids), len(a_names), len(MAX_DETS)))

        for ci, cat in enumerate(self.cat_ids):
            for ai, a_name in enumerate(a_names):
                rng = AREA_RNGS[a_name]
                per_img = [
                    self._match_img(
                        self._gt[(img, cat)], dt[(img, cat)], rng, max(MAX_DETS)
                    )
                    for img in self.img_ids
                ]
                for di, max_det in enumerate(MAX_DETS):
                    stats = self._accumulate(per_img, max_det)
                    if stats is None:
                        continue
                    prec, rec = stats
                    precision[:, :, ci, ai, di] = prec
                    recall[:, ci, ai, di] = rec

        def _ap(t=None, area="all", max_det=100):
            ai, di = a_names.index(area), MAX_DETS.index(max_det)
            if t is None:
                p = precision[:, :, :, ai, di]
            else:
                ti = int(np.argmin(np.abs(IOU_THRS - t)))
                p = precision[ti : ti + 1, :, :, ai, di]
            p = p[p > -1]
            return float(p.mean()) if p.size else -1.0

        def _ar(area="all", max_det=100):
            ai, di = a_names.index(area), MAX_DETS.index(max_det)
            r = recall[:, :, ai, di]
            r = r[r > -1]
            return float(r.mean()) if r.size else -1.0

        values = [
            _ap(), _ap(t=0.5), _ap(t=0.75),
            _ap(area="small"), _ap(area="medium"), _ap(area="large"),
            _ar(max_det=1), _ar(max_det=10), _ar(max_det=100),
            _ar(area="small"), _ar(area="medium"), _ar(area="large"),
        ]
        return dict(zip(COCO_KEYS, values))
