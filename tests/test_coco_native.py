"""Native COCO parser (native/coco_parse.cc): differential against
Python json extraction, strict-failure fallback semantics, and dataset
integration parity."""

import json

import numpy as np
import pytest

from layoutdit_tpu.native import cocojson

pytestmark = pytest.mark.skipif(
    not cocojson.available(), reason="native coco parser unavailable"
)


def _coco_json(n_img=7, n_ann=23, seed=0, **extras):
    rng = np.random.default_rng(seed)
    data = {
        "info": {"year": 2020, "description": "synthetic é中"},
        "licenses": [{"id": 1, "url": "http://x"}],
        "images": [
            {
                "id": 100 + i,
                "width": int(rng.integers(100, 2000)),
                "height": int(rng.integers(100, 2000)),
                "file_name": f"dir/PMC_{i:04d}ü.jpg",
                "license": 1,
            }
            for i in range(n_img)
        ],
        "annotations": [
            {
                "id": j,
                "image_id": 100 + int(rng.integers(0, n_img)),
                "category_id": int(rng.integers(1, 6)),
                "bbox": [round(float(v), 2) for v in rng.uniform(0, 500, 4)],
                "area": round(float(rng.uniform(1, 1e5)), 3),
                "iscrowd": int(rng.integers(0, 2)),
                "segmentation": [[float(v) for v in rng.uniform(0, 500, 8)]],
            }
            for j in range(n_ann)
        ],
        "categories": [
            {"id": c, "name": n, "supercategory": ""}
            for c, n in enumerate(
                ["text", "title", "list", "table", "figure"], 1
            )
        ],
    }
    data.update(extras)
    return data


def test_differential_vs_python_json():
    data = _coco_json()
    raw = json.dumps(data).encode()
    arr = cocojson.parse_coco_bytes(raw)
    assert arr is not None
    re = arr.to_coco_data()
    py = json.loads(raw.decode())
    assert [im["id"] for im in re["images"]] == [im["id"] for im in py["images"]]
    for a, b in zip(re["images"], py["images"]):
        assert a["width"] == b["width"] and a["height"] == b["height"]
        assert a["file_name"] == b["file_name"]
    assert len(re["annotations"]) == len(py["annotations"])
    for a, b in zip(re["annotations"], py["annotations"]):
        for k in ("id", "image_id", "category_id", "iscrowd"):
            assert a[k] == b[k]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-6)
        assert abs(a["area"] - b["area"]) < 1e-6 * max(1.0, b["area"])
    assert re["categories"] == py["categories"]


def test_escapes_and_compact_whitespace():
    data = _coco_json(n_img=2, n_ann=1)
    data["images"][0]["file_name"] = 'we\\ird\t"name"\n♞.jpg'
    # compact AND ensure_ascii both ways
    for kwargs in ({"separators": (",", ":")}, {"ensure_ascii": True},
                   {"indent": 3}):
        raw = json.dumps(data, **kwargs).encode()
        arr = cocojson.parse_coco_bytes(raw)
        assert arr is not None
        assert arr.file_names[0] == data["images"][0]["file_name"]


def test_key_order_independent():
    data = _coco_json(n_img=1, n_ann=1)
    img = data["images"][0]
    data["images"][0] = dict(reversed(list(img.items())))
    ann = data["annotations"][0]
    data["annotations"][0] = dict(reversed(list(ann.items())))
    arr = cocojson.parse_coco_bytes(json.dumps(data).encode())
    assert arr is not None and arr.img_id[0] == img["id"]
    np.testing.assert_allclose(arr.ann_bbox[0], ann["bbox"], rtol=1e-6)


def test_strict_failures_return_none():
    ok = _coco_json(n_img=1, n_ann=1)
    # each mutation must fail the parse (fallback), never mis-parse
    bad_variants = []
    b1 = json.loads(json.dumps(ok))
    del b1["images"][0]["file_name"]
    bad_variants.append(json.dumps(b1))
    b2 = json.loads(json.dumps(ok))
    del b2["annotations"][0]["bbox"]
    bad_variants.append(json.dumps(b2))
    b3 = json.loads(json.dumps(ok))
    b3["annotations"][0]["image_id"] = "str-id"
    bad_variants.append(json.dumps(b3))
    b4 = json.loads(json.dumps(ok))
    del b4["categories"]
    bad_variants.append(json.dumps(b4))
    bad_variants.append(json.dumps(ok)[:-20])          # truncated
    bad_variants.append(json.dumps(ok) + "garbage")     # trailing
    bad_variants.append('{"images": [1, 2]}')
    bad_variants.append("[]")
    bad_variants.append("")
    for raw in bad_variants:
        assert cocojson.parse_coco_bytes(raw.encode()) is None, raw[:80]


def test_float_ids_rejected():
    data = _coco_json(n_img=1, n_ann=1)
    raw = json.dumps(data).replace('"id": 100,', '"id": 100.0,')
    assert cocojson.parse_coco_bytes(raw.encode()) is None


def test_empty_sections_ok():
    raw = json.dumps(
        {"images": [], "annotations": [], "categories": []}
    ).encode()
    arr = cocojson.parse_coco_bytes(raw)
    assert arr is not None
    assert len(arr.img_id) == 0 and len(arr.ann_id) == 0
    assert arr.categories == []


def test_dataset_native_matches_fallback(tmp_path, monkeypatch):
    """PubLayNetDataset on the native path == json fallback path:
    image_info, ids, cat_id_to_label, load_target (bitwise), coco_data
    (modulo keys the framework never reads), annotations grouping."""
    from layoutdit_tpu.data.dataset import PubLayNetDataset

    data = _coco_json(n_img=5, n_ann=17, seed=4)
    # degenerate box exercising load_target's filter
    data["annotations"][0]["bbox"] = [10.0, 10.0, 0.0, 5.0]
    ann_path = str(tmp_path / "ann.json")
    json.dump(data, open(ann_path, "w"))

    ds_native = PubLayNetDataset(str(tmp_path), ann_path)
    assert ds_native._arr is not None  # native path actually taken
    monkeypatch.setenv("LAYOUTDIT_NO_NATIVE_COCO", "1")
    ds_py = PubLayNetDataset(str(tmp_path), ann_path)
    assert ds_py._arr is None

    assert ds_native.ids == ds_py.ids
    assert ds_native.cat_id_to_label == ds_py.cat_id_to_label
    for i in ds_py.ids:
        a, b = ds_native.image_info[i], ds_py.image_info[i]
        for k in ("id", "width", "height", "file_name"):
            assert a[k] == b[k]
        ta, tb = ds_native.load_target(i), ds_py.load_target(i)
        np.testing.assert_array_equal(ta["boxes"], tb["boxes"])
        np.testing.assert_array_equal(ta["labels"], tb["labels"])
        np.testing.assert_array_equal(ta["image_id"], tb["image_id"])
        assert ta["boxes"].dtype == tb["boxes"].dtype
        assert ta["labels"].dtype == tb["labels"].dtype

    # lazy dict views agree on every field the framework reads
    cd_n, cd_p = ds_native.coco_data, ds_py.coco_data
    assert cd_n["categories"] == cd_p["categories"]
    assert len(cd_n["annotations"]) == len(cd_p["annotations"])
    for a, b in zip(cd_n["annotations"], cd_p["annotations"]):
        for k in ("id", "image_id", "category_id", "iscrowd", "area", "bbox"):
            assert a[k] == b[k], k
    assert set(ds_native.annotations) == set(ds_py.annotations)
    for i, anns in ds_py.annotations.items():
        assert [a["id"] for a in ds_native.annotations[i]] == [a["id"] for a in anns]


def test_dataset_evaluator_same_metrics_native(tmp_path, monkeypatch):
    """CocoEvaluator fed the native-path coco_data scores identically."""
    from layoutdit_tpu.data.dataset import PubLayNetDataset
    from layoutdit_tpu.eval.coco_eval import CocoEvaluator

    data = _coco_json(n_img=4, n_ann=12, seed=9)
    ann_path = str(tmp_path / "ann.json")
    json.dump(data, open(ann_path, "w"))
    preds = [
        {"image_id": int(a["image_id"]), "category_id": int(a["category_id"]),
         "bbox": list(a["bbox"]), "score": 0.9 - 0.01 * k}
        for k, a in enumerate(data["annotations"][:8])
    ]
    ds_native = PubLayNetDataset(str(tmp_path), ann_path)
    monkeypatch.setenv("LAYOUTDIT_NO_NATIVE_COCO", "1")
    ds_py = PubLayNetDataset(str(tmp_path), ann_path)
    m_n = CocoEvaluator(ds_native.coco_data).evaluate(preds)
    m_p = CocoEvaluator(ds_py.coco_data).evaluate(preds)
    assert m_n == m_p


def test_non_integral_image_size_falls_back():
    data = _coco_json(n_img=1, n_ann=1)
    raw = json.dumps(data)
    raw = raw.replace(f'"width": {data["images"][0]["width"]}',
                      '"width": 612.5')
    assert cocojson.parse_coco_bytes(raw.encode()) is None
