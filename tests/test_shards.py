"""Tar-sharded image storage (data/shards.py): index correctness,
ranged reads == original bytes, dataset drop-in parity, and a sharded
end-to-end train epoch. The reference reads one GCS object per page
(publay_dataset.py:44-50) — no sharded layout exists there."""

import json
import os
import tarfile

import numpy as np

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.data.dataset import PubLayNetDataset
from layoutdit_tpu.data.shards import (
    ShardIndex,
    build_shards,
    make_sharded_dataset,
)
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
from layoutdit_tpu.tools.make_shards import main as make_shards_main


def _fixture(tmp_path, n=6):
    root = str(tmp_path)
    make_fixture(root, n_images=n, split="samples", seed=8)
    ann = os.path.join(root, "samples.json")
    images = os.path.join(root, "samples")
    return root, images, ann


def test_build_and_ranged_reads(tmp_path):
    root, images, ann = _fixture(tmp_path)
    out = os.path.join(root, "shards")
    names = [img["file_name"]
             for img in json.load(open(ann))["images"]]

    def read_bytes(n):
        return open(os.path.join(images, n), "rb").read()

    # tiny shard budget -> multiple shards exercised
    first = read_bytes(names[0])
    index = build_shards(names, read_bytes, out,
                         shard_size_bytes=2 * len(first))
    assert len(index["shards"]) > 1
    assert sorted(index["entries"]) == sorted(names)

    # the shards are REAL tar files (interoperable with tar tooling)
    with tarfile.open(os.path.join(out, index["shards"][0])) as t:
        member_names = t.getnames()
    assert member_names and all(m in index["entries"] for m in member_names)

    si = ShardIndex(out)
    try:
        assert len(si) == len(names)
        for n in names:
            assert si.read(n) == read_bytes(n)
        assert names[0] in si and "nope.jpg" not in si
    finally:
        si.close()


def test_sharded_dataset_matches_plain(tmp_path):
    root, images, ann = _fixture(tmp_path)
    out = os.path.join(root, "shards")
    make_shards_main(["--images", images, "--annotations", ann,
                      "--out", out, "--shard-mb", "1"])

    plain = PubLayNetDataset(images, ann)
    sharded = make_sharded_dataset(out, ann)
    assert sharded.ids == plain.ids
    for img_id in plain.ids:
        assert sharded.load_image_bytes(img_id) == plain.load_image_bytes(img_id)
        np.testing.assert_array_equal(
            sharded.load_image(img_id), plain.load_image(img_id)
        )
        ta, tb = sharded.load_target(img_id), plain.load_target(img_id)
        np.testing.assert_array_equal(ta["boxes"], tb["boxes"])


def test_sharded_train_epoch(tmp_path):
    """DetectionLoader + trainer run unchanged on the sharded dataset
    (native decode path consumes load_image_bytes)."""
    from layoutdit_tpu.data.pipeline import DetectionLoader
    from layoutdit_tpu.models.detection.detector import (
        detector_loss,
        init_detector_params,
    )

    root, images, ann = _fixture(tmp_path, n=4)
    out = os.path.join(root, "shards")
    make_shards_main(["--images", images, "--annotations", ann,
                      "--out", out])
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        ds = make_sharded_dataset(out, ann)
        loader = DetectionLoader(
            ds, batch_size=4, shuffle=False, device_put=False,
            image_size=cfg.detection_model_config.image_size,
        )
        batches = list(loader)
        assert len(batches) == 1
        b = batches[0]
        assert b.images.shape[0] == 4 and np.isfinite(b.images).all()
        assert b.gt_valid.any()
    finally:
        set_layout_dit_config(None)


def test_trainer_uses_shards_from_config(tmp_path):
    """image_shards_dir routes the CLI train path through the shard
    reader end to end (1 epoch, loss finite)."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root, images, ann = _fixture(tmp_path, n=4)
    out = os.path.join(root, "shards")
    make_shards_main(["--images", images, "--annotations", ann,
                      "--out", out])
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.data_loader_config.image_shards_dir = out
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        assert hasattr(trainer.dataloader.dataset, "shard_index")
        trainer.train()
        assert np.isfinite(trainer.loss_history[0])
    finally:
        set_layout_dit_config(None)


def test_shards_over_memory_filesystem():
    """build_shards / ShardIndex work on a non-POSIX fsspec backend
    (stand-in for gs://): ranged reads via the object-store interface."""
    import fsspec

    fs = fsspec.filesystem("memory")
    try:
        blobs = {f"img_{i}.jpg": bytes([i]) * (100 + i) for i in range(5)}
        out = "memory://ldtpu-shards/train"
        index = build_shards(
            list(blobs), lambda n: blobs[n], out,
            shard_size_bytes=300,
        )
        assert len(index["shards"]) >= 2
        si = ShardIndex(out)
        try:
            for name, data in blobs.items():
                assert si.read(name) == data
        finally:
            si.close()
    finally:
        try:
            fs.rm("/ldtpu-shards", recursive=True)
        except FileNotFoundError:
            pass
