"""Tar-sharded image storage for PubLayNet-scale corpora.

The reference reads each page as an individual GCS object
(publay_dataset.py:44-50): at 335k images/epoch that is 335k object
lookups with per-request latency and no locality. This module packs
images into fixed-size uncompressed tar shards with a byte-offset
index, so a page read is one ranged read into a large sequential
object — the storage layout TPU input pipelines actually use (the
ArrayRecord/WebDataset pattern) — while keeping the dataset API
byte-for-byte identical (`ShardedPubLayNetDataset` plugs into the same
`DetectionLoader` / native decoder path).

Layout:
  {out_dir}/shard-00000.tar, shard-00001.tar, ...
  {out_dir}/index.json   {"shards": [...], "entries":
                          {file_name: [shard_idx, offset, size]}}
"""

from __future__ import annotations

import io
import json
import tarfile
import threading

from layoutdit_tpu.log import get_logger
from layoutdit_tpu.utils.paths import join_path
from layoutdit_tpu.utils.retry import retry_io

logger = get_logger(__name__)

INDEX_NAME = "index.json"


def build_shards(
    file_names: list[str],
    read_bytes,
    out_dir: str,
    shard_size_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Pack ``file_names`` (in order) into tar shards under ``out_dir``.

    read_bytes: file_name -> bytes (seam: local dir, GCS, zip, ...).
    Returns the index dict (also written to {out_dir}/index.json).
    """
    import fsspec

    shards: list[str] = []
    entries: dict[str, list] = {}
    tar = None
    buf = None

    def flush():
        nonlocal tar, buf
        if tar is None:
            return
        tar.close()
        shard_name = f"shard-{len(shards):05d}.tar"
        with fsspec.open(join_path(out_dir, shard_name), "wb",
                         auto_mkdir=True) as f:
            f.write(buf.getvalue())
        shards.append(shard_name)
        tar, buf = None, None

    for name in file_names:
        data = read_bytes(name)
        if tar is None:
            buf = io.BytesIO()
            tar = tarfile.open(fileobj=buf, mode="w")
        info = tarfile.TarInfo(name=name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
        # tarfile does not record offsets on WRITE (only on read), so
        # derive the payload start from the stream position: addfile
        # leaves the cursor after header blocks + payload + padding,
        # and only the payload+padding length is data-dependent — this
        # stays correct even with pax/long-name extra header blocks.
        end = buf.tell()
        offset = end - (len(data) + (-len(data)) % 512)
        entries[name] = [len(shards), offset, len(data)]
        if buf.tell() >= shard_size_bytes:
            flush()
    flush()

    index = {"shards": shards, "entries": entries}
    with fsspec.open(join_path(out_dir, INDEX_NAME), "w",
                     auto_mkdir=True) as f:
        json.dump(index, f)
    logger.info(
        "Wrote %d images into %d shard(s) under %s",
        len(entries), len(shards), out_dir,
    )
    return index


class ShardIndex:
    """Ranged reads out of the shard set (one open handle per shard,
    guarded — the loader's producer thread is the only reader in
    practice, but serving may fan out)."""

    def __init__(self, shard_dir: str):
        import fsspec

        self.shard_dir = shard_dir
        self.fs_open = fsspec.open
        with fsspec.open(join_path(shard_dir, INDEX_NAME), "r") as f:
            index = json.load(f)
        self.shards: list[str] = index["shards"]
        self.entries: dict[str, list] = index["entries"]
        self._handles: dict[int, object] = {}
        self._lock = threading.Lock()

    def __contains__(self, file_name: str) -> bool:
        return file_name in self.entries

    def __len__(self) -> int:
        return len(self.entries)

    def _handle(self, shard_idx: int):
        h = self._handles.get(shard_idx)
        if h is None:
            path = join_path(self.shard_dir, self.shards[shard_idx])
            h = self.fs_open(path, "rb").open()
            self._handles[shard_idx] = h
        return h

    @retry_io
    def read(self, file_name: str) -> bytes:
        shard_idx, offset, size = self.entries[file_name]
        with self._lock:
            h = self._handle(shard_idx)
            h.seek(offset)
            return h.read(size)

    @retry_io
    def read_prefix(self, file_name: str, n: int) -> bytes:
        """First min(n, size) bytes of a member — enough for image
        header parsing without downloading the whole page."""
        shard_idx, offset, size = self.entries[file_name]
        with self._lock:
            h = self._handle(shard_idx)
            h.seek(offset)
            return h.read(min(n, size))

    def close(self) -> None:
        with self._lock:
            for h in self._handles.values():
                try:
                    h.close()
                except Exception:  # noqa: BLE001
                    pass
            self._handles.clear()


def make_sharded_dataset(shard_dir: str, annotations_json_path: str):
    """PubLayNetDataset whose image reads come from tar shards; the
    annotation/index API (native parser included) is unchanged."""
    from layoutdit_tpu.data.dataset import PubLayNetDataset

    class ShardedPubLayNetDataset(PubLayNetDataset):
        def __init__(self):
            super().__init__(
                images_root_dir=shard_dir,
                annotations_json_path=annotations_json_path,
            )
            self.shard_index = ShardIndex(shard_dir)

        @retry_io
        def load_image_bytes(self, img_id) -> bytes:
            return self.shard_index.read(
                self.image_info[img_id]["file_name"]
            )

        def load_image(self, img_id):
            import numpy as np
            from PIL import Image

            raw = self.load_image_bytes(img_id)
            image = Image.open(io.BytesIO(raw)).convert("RGB")
            arr = np.asarray(image, dtype=np.float32) / 255.0
            return arr.transpose(2, 0, 1)

    return ShardedPubLayNetDataset()
