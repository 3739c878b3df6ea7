"""TensorBoard event writer (utils/tensorboard.py): stdlib TFRecord +
proto encoding verified by an independent decoder in this test, plus
trainer integration. Observability beyond the reference (its telemetry
is stdout lines + a loss PNG, trainer.py:217-230)."""

import json
import os
import struct

from layoutdit_tpu.utils.tensorboard import (
    TensorBoardWriter,
    _masked_crc,
    crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for the Castagnoli polynomial
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


# ------------------------------------------------- independent decoder

def _read_records(raw: bytes):
    """TFRecord framing: len u64 | crc(len) u32 | data | crc(data) u32."""
    off, out = 0, []
    while off < len(raw):
        (n,) = struct.unpack_from("<Q", raw, off)
        header = raw[off:off + 8]
        (hcrc,) = struct.unpack_from("<I", raw, off + 8)
        assert hcrc == _masked_crc(header), "length crc mismatch"
        data = raw[off + 12:off + 12 + n]
        (dcrc,) = struct.unpack_from("<I", raw, off + 12 + n)
        assert dcrc == _masked_crc(data), "data crc mismatch"
        out.append(data)
        off += 12 + n + 4
    return out


def _fields(buf: bytes):
    """Minimal proto walker: yields (field, wire, value)."""
    off = 0
    while off < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v, shift = 0, 0
            while True:
                b = buf[off]
                off += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wire, v
        elif wire == 1:  # fixed64
            yield field, wire, buf[off:off + 8]
            off += 8
        elif wire == 2:  # length-delimited
            n, shift = 0, 0
            while True:
                b = buf[off]
                off += 1
                n |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield field, wire, buf[off:off + n]
            off += n
        elif wire == 5:  # fixed32
            yield field, wire, buf[off:off + 4]
            off += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")


def _decode_events(raw: bytes):
    """[(step, {tag: value})] plus the file_version string."""
    version = None
    events = []
    for rec in _read_records(raw):
        step, scalars = 0, {}
        for field, wire, val in _fields(rec):
            if field == 2 and wire == 0:
                step = val
            elif field == 3 and wire == 2:
                version = val.decode()
            elif field == 5 and wire == 2:  # Summary
                for f2, w2, v2 in _fields(val):
                    if f2 == 1 and w2 == 2:  # Summary.Value
                        tag, sv = None, None
                        for f3, w3, v3 in _fields(v2):
                            if f3 == 1 and w3 == 2:
                                tag = v3.decode()
                            elif f3 == 2 and w3 == 5:
                                (sv,) = struct.unpack("<f", v3)
                        scalars[tag] = sv
        if scalars:
            events.append((step, scalars))
    return version, events


def test_writer_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path / "tb"))
    w.scalar("train/loss", 2.5, step=1)
    w.scalar("train/loss", 1.25, step=2)
    w.scalars({"train/lr": 1e-3, "train/name": "skipme"}, step=2)
    w.flush()
    # flush is idempotent and rewrite-safe (object-store friendly)
    w.flush()

    raw = open(w.path, "rb").read()
    version, events = _decode_events(raw)
    assert version == "brain.Event:2"
    assert (1, {"train/loss": 2.5}) == events[0]
    assert events[1] == (2, {"train/loss": 1.25})
    assert events[2][1]["train/lr"] == struct.unpack("<f", struct.pack("<f", 1e-3))[0]
    assert all("train/name" not in e[1] for e in events)  # non-numeric skipped


def test_trainer_writes_tb_events(tmp_path):
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import (
        make_fixture,
        write_fixture_config,
    )
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=11)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        Trainer(cfg, model).train()
        tb_dir = os.path.join(root, "fixture", "tb")
        files = [f for f in os.listdir(tb_dir)
                 if f.startswith("events.out.tfevents.")]
        assert len(files) == 1
        _, events = _decode_events(
            open(os.path.join(tb_dir, files[0]), "rb").read()
        )
        steps = [s for s, _ in events]
        assert steps == [1, 2]
        for _, scalars in events:
            assert set(scalars) >= {
                "train/loss", "train/images_per_sec", "train/learning_rate"
            }
            assert all(v == v for v in scalars.values())  # finite
    finally:
        set_layout_dit_config(None)


def test_writer_over_memory_filesystem():
    """flush() rewrites the whole file through fsspec — object-store
    (gs://) compatible by construction; exercised on memory://."""
    import fsspec

    w = TensorBoardWriter("memory://ldtpu-tb/run1")
    try:
        w.scalar("train/loss", 3.0, step=1)
        w.flush()
        w.scalar("train/loss", 1.5, step=2)
        w.flush()  # full rewrite, not append
        with fsspec.open(w.path, "rb") as f:
            version, events = _decode_events(f.read())
        assert version == "brain.Event:2"
        assert [(s, d["train/loss"]) for s, d in events] == [
            (1, 3.0), (2, 1.5)
        ]
    finally:
        fs = fsspec.filesystem("memory")
        try:
            fs.rm("/ldtpu-tb", recursive=True)
        except FileNotFoundError:
            pass
