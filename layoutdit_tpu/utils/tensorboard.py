"""TensorBoard scalar event writer — stdlib only.

The reference's only training telemetry is stdout log lines and a loss
PNG (trainer.py:217-230); `metrics.jsonl` already adds a structured
store, and this writer makes the same scalars viewable live in
TensorBoard (`tensorboard --logdir <run>/tb`). No tensorflow /
tensorboardX dependency: events are hand-encoded protobuf
(`tensorflow.Event` with `Summary.simple_value`) wrapped in TFRecord
framing with masked CRC32C — the complete on-disk format.

Format notes (TFRecord): each record is
  uint64 LE length | uint32 LE masked_crc(length bytes)
  | data | uint32 LE masked_crc(data)
where masked_crc(x) = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32). The
first event in a file must carry file_version "brain.Event:2".
"""

from __future__ import annotations

import struct
import time

# ---------------------------------------------------------------- crc32c

_CRC_TABLE = []


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- proto encoding


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _event(wall_time: float, step: int, *, file_version: str | None = None,
           summary: bytes | None = None) -> bytes:
    # tensorflow.Event: 1=wall_time double, 2=step int64,
    # 3=file_version string, 5=summary message
    out = _key(1, 1) + struct.pack("<d", wall_time)
    if step:
        out += _key(2, 0) + _varint(step)
    if file_version is not None:
        out += _len_delim(3, file_version.encode())
    if summary is not None:
        out += _len_delim(5, summary)
    return out


def _scalar_summary(tag: str, value: float) -> bytes:
    # Summary.Value: 1=tag string, 2=simple_value float; Summary: 1=values
    val = _len_delim(1, tag.encode()) + _key(2, 5) + struct.pack("<f", value)
    return _len_delim(1, val)


def _record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (header + struct.pack("<I", _masked_crc(header))
            + data + struct.pack("<I", _masked_crc(data)))


# ------------------------------------------------------------- writer


class TensorBoardWriter:
    """Accumulates scalar events in memory; ``flush()`` (re)writes the
    whole event file through ``fs_open`` — append-free so it works on
    object stores (gs://) where the reference keeps all artifacts."""

    def __init__(self, logdir: str, fs_open=None):
        if fs_open is None:
            import fsspec

            fs_open = fsspec.open
        self._fs_open = fs_open
        # TB discovers files named events.out.tfevents.<ts>.<host>
        self.path = f"{logdir}/events.out.tfevents.{int(time.time())}.layoutdit"
        self._buf = bytearray(
            _record(_event(time.time(), 0, file_version="brain.Event:2"))
        )
        self._dirty = True

    def scalar(self, tag: str, value: float, step: int,
               wall_time: float | None = None) -> None:
        wt = time.time() if wall_time is None else wall_time
        self._buf += _record(
            _event(wt, int(step), summary=_scalar_summary(tag, float(value)))
        )
        self._dirty = True

    def scalars(self, values: dict, step: int) -> None:
        """All tags in ONE Event record (one Summary, many Values)."""
        summary = b""
        for tag, v in values.items():
            try:
                summary += _scalar_summary(tag, float(v))
            except (TypeError, ValueError):
                continue  # non-numeric metric (paths, names)
        if summary:
            self._buf += _record(
                _event(time.time(), int(step), summary=summary)
            )
            self._dirty = True

    def flush(self) -> None:
        if not self._dirty:
            return
        with self._fs_open(self.path, "wb", auto_mkdir=True) as f:
            f.write(bytes(self._buf))
        self._dirty = False

    def close(self) -> None:
        self.flush()
