"""Sanitizer coverage for the native layer: ASan+UBSan over a hostile
corpus (COCO parser + JPEG decoder), TSan over the threaded batch
decode. The reference had no native code to sanitize (SURVEY.md §5);
this rebuild does, so the box is actually earned here."""

import io
import json
import os
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "layoutdit_tpu", "native",
)
SOURCES = [
    os.path.join(NATIVE, "sanitize_main.cc"),
    os.path.join(NATIVE, "coco_parse.cc"),
    os.path.join(NATIVE, "loader.cc"),
]


def _build(tmp, flags):
    out = os.path.join(tmp, "sanitize_bin")
    cmd = ["g++", "-O1", "-g", "-fno-omit-frame-pointer", *flags,
           "-o", out, *SOURCES, "-ljpeg", "-pthread"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    if r.returncode != 0:
        pytest.skip(f"sanitizer toolchain unavailable: {r.stderr[-300:]}")
    return out


def _corpus_coco(tmp):
    """Valid + systematically corrupted + random-garbage JSON files."""
    rng = np.random.default_rng(0)
    good = {
        "images": [{"id": i, "width": 100, "height": 200,
                    "file_name": f"f{i}ü.jpg"} for i in range(4)],
        "annotations": [
            {"id": j, "image_id": j % 4, "category_id": 1,
             "bbox": [1.0, 2.0, 3.0, 4.0], "area": 12.0, "iscrowd": 0,
             "segmentation": [[1.0, 2.0, 3.0, 4.0]]} for j in range(9)
        ],
        "categories": [{"id": 1, "name": "text"}],
    }
    raw = json.dumps(good).encode()
    paths = []

    def put(name, blob):
        p = os.path.join(tmp, name)
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)

    put("good.json", raw)
    # every truncation length (boundary conditions in the scanner)
    for cut in range(0, len(raw), 37):
        put(f"trunc_{cut}.json", raw[:cut])
    # deterministic byte flips
    for k in range(60):
        b = bytearray(raw)
        for _ in range(3):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        put(f"flip_{k}.json", bytes(b))
    # pure garbage, huge-depth nesting, escape bombs
    put("garbage.json", bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
    put("deep.json", (b"[" * 5000) + (b"]" * 5000))
    put("escapes.json", b'{"images": [{"file_name": "' + b"\\u00e9" * 500
        + b'\\ud83d\\ude00", "id": 1, "width": 1, "height": 1}], '
        b'"annotations": [], "categories": []}')
    put("lone_surrogate.json",
        b'{"images": [{"file_name": "\\ud800", "id": 1, "width": 1, '
        b'"height": 1}], "annotations": [], "categories": []}')
    return paths


def _corpus_jpeg(tmp):
    from PIL import Image

    paths = []
    img = Image.fromarray(
        (np.random.default_rng(1).uniform(0, 255, (48, 64, 3))).astype("uint8")
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    raw = buf.getvalue()

    def put(name, blob):
        p = os.path.join(tmp, name)
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)

    put("good.jpg", raw)
    put("good2.jpg", raw)
    for cut in (1, len(raw) // 3, len(raw) - 2):
        put(f"trunc_{cut}.jpg", raw[:cut])
    b = bytearray(raw)
    b[len(b) // 2] ^= 0xFF
    put("flip.jpg", bytes(b))
    put("empty.jpg", b"")
    put("garbage.jpg", b"\xff\xd8\xff" + b"\x00" * 100)
    return paths


@pytest.mark.slow
def test_asan_ubsan_native_corpus(tmp_path):
    tmp = str(tmp_path)
    binary = _build(tmp, [
        "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
    ])
    env = {**os.environ, "ASAN_OPTIONS": "detect_leaks=1"}
    r = subprocess.run(
        [binary, "coco", *_corpus_coco(tmp)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # the valid file (at least) parsed; most of the corpus is hostile
    parsed = int(r.stdout.split("coco:")[1].strip().split("/")[0])
    assert parsed >= 1
    r = subprocess.run(
        [binary, "jpeg", "32", *_corpus_jpeg(tmp)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_tsan_threaded_decode(tmp_path):
    tmp = str(tmp_path)
    binary = _build(tmp, ["-fsanitize=thread"])
    jpegs = _corpus_jpeg(tmp) * 4  # enough work for all 4 decode threads
    r = subprocess.run(
        [binary, "jpeg", "32", *jpegs],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "WARNING: ThreadSanitizer" not in r.stderr
