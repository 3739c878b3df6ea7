"""Mask data-path tests: COCO segmentation decode (polygons, RLE both
codings), rasterization, dataset plumbing, and the loader's gt_masks
block (data/masks.py, data/dataset.py with_segmentation, pipeline)."""

import json

import numpy as np
import pytest

from layoutdit_tpu.data.dataset import PubLayNetDataset
from layoutdit_tpu.data.masks import (
    decode_compressed_rle,
    rasterize_instance,
    rasterize_target_masks,
    rle_to_mask,
)
from layoutdit_tpu.data.pipeline import DetectionLoader
from layoutdit_tpu.tools.make_fixture import make_fixture

# ------------------------------------------------------------------- RLE


def _encode_compressed_rle(counts):
    """pycocotools rleToString transcription (test-only encoder: the
    production path only decodes)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def test_compressed_rle_roundtrip():
    counts = [3, 5, 0, 2, 7, 1]
    s = _encode_compressed_rle(counts)
    assert decode_compressed_rle(s) == counts


def test_compressed_rle_large_runs():
    counts = [0, 100000, 250, 99750]
    s = _encode_compressed_rle(counts)
    assert decode_compressed_rle(s) == counts


def test_rle_to_mask_column_major():
    # 2x3 mask, runs [1, 2, 3] = one 0, two 1s, three 0s:
    # flat column-major [0, 1, 1, 0, 0, 0] -> cols (0,1), (1,0), (0,0)
    m = rle_to_mask([1, 2, 3], (2, 3))
    want = np.array([[0, 1, 0], [1, 0, 0]], np.uint8)
    np.testing.assert_array_equal(m, want)


def test_rle_string_matches_list():
    counts = [4, 3, 5, 4]
    a = rle_to_mask(counts, (4, 4))
    b = rle_to_mask(_encode_compressed_rle(counts), (4, 4))
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------ rasterize


def test_rasterize_polygon_rectangle():
    # rectangle polygon covering the left half of a 64x64 image,
    # rasterized onto a 32-grid: columns [0, 16) filled
    seg = [[0, 0, 32, 0, 32, 64, 0, 64]]
    m = rasterize_instance(seg, 64, 64, 32)
    assert m.shape == (32, 32)
    assert m[:, :15].all()
    assert not m[:, 17:].any()


def test_rasterize_rle_instance():
    # full-coverage RLE (all ones) resampled to any grid stays all ones
    seg = {"counts": [0, 16 * 16], "size": [16, 16]}
    m = rasterize_instance(seg, 16, 16, 8)
    np.testing.assert_array_equal(m, 1)


def test_rasterize_target_masks_padding():
    segs = [[[0, 0, 10, 0, 10, 10, 0, 10]], None]
    out = rasterize_target_masks(segs, 20, 20, 16, max_gt=4)
    assert out.shape == (4, 16, 16)
    assert out[0].sum() > 0
    assert out[1].sum() == 0  # None entry stays empty
    assert out[2:].sum() == 0  # padding rows


# ---------------------------------------------------------- dataset/loader


@pytest.fixture(scope="module")
def seg_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("publay_seg")
    make_fixture(str(root), n_images=6, split="samples", seed=0)
    return root


def test_dataset_segmentation_rows_align(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
        with_segmentation=True,
    )
    t = ds.load_target(ds.ids[0])
    assert "segmentation" in t
    assert len(t["segmentation"]) == len(t["boxes"])
    # the fixture's segmentation is the box rectangle: polygon bounds
    # must equal the xyxy box
    poly = np.asarray(t["segmentation"][0][0]).reshape(-1, 2)
    box = t["boxes"][0]
    np.testing.assert_allclose(
        [poly[:, 0].min(), poly[:, 1].min(), poly[:, 0].max(), poly[:, 1].max()],
        box,
    )


def test_dataset_without_flag_has_no_segmentation(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
    )
    assert "segmentation" not in ds.load_target(ds.ids[0])


def test_loader_requires_segmentation_dataset(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
    )
    with pytest.raises(ValueError, match="with_segmentation"):
        DetectionLoader(ds, load_masks=True, device_put=False)


def test_loader_gt_masks_block(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
        with_segmentation=True,
    )
    loader = DetectionLoader(
        ds, batch_size=3, shuffle=False, image_size=64, max_gt=16,
        device_put=False, load_masks=True, use_native=False,
    )
    batch = next(iter(loader))
    assert batch.gt_masks is not None
    assert batch.gt_masks.shape == (3, 16, 32, 32)  # M = image_size // 2
    assert batch.gt_masks.dtype == np.uint8
    gm = batch.gt_masks
    valid = batch.gt_valid
    # every valid gt's mask must cover ~its (rectangular) box, and empty
    # rows must stay empty
    for b in range(3):
        for g in range(16):
            if valid[b, g]:
                x1, y1, x2, y2 = batch.gt_boxes[b, g] / 2  # model->mask space
                w, h = x2 - x1, y2 - y1
                area = w * h
                got = gm[b, g].sum()
                # PIL polygon fill is boundary-inclusive: expect up to
                # ~one extra pixel per edge (perimeter-scaled slack)
                assert abs(got - area) <= 2 * (w + h) + 6
            else:
                assert gm[b, g].sum() == 0


def test_loader_without_masks_keeps_none(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
    )
    loader = DetectionLoader(
        ds, batch_size=2, shuffle=False, image_size=64, max_gt=8,
        device_put=False, use_native=False,
    )
    batch = next(iter(loader))
    assert batch.gt_masks is None


def test_hflip_flips_masks(seg_fixture):
    ds = PubLayNetDataset(
        images_root_dir=str(seg_fixture / "samples"),
        annotations_json_path=str(seg_fixture / "samples.json"),
        with_segmentation=True,
    )

    def batch_with(p):
        loader = DetectionLoader(
            ds, batch_size=2, shuffle=False, image_size=64, max_gt=16,
            device_put=False, load_masks=True, use_native=False,
            augment_hflip=p, seed=3,
        )
        return next(iter(loader))

    plain = batch_with(0.0)
    flipped = batch_with(1.0)
    for b in range(2):
        np.testing.assert_array_equal(
            flipped.gt_masks[b], plain.gt_masks[b][:, :, ::-1]
        )
