"""AOT model export: self-contained StableHLO serving artifacts.

The reference's only inference story is "re-run the training repo"
(reference main.py:12-43 — train, then score in-process). TPU-native
deployment wants the opposite: a frozen, versioned artifact that runs
without any model code. ``jax.export`` serializes the jitted predict
function — backbone through NMS and box rescale — as StableHLO with
jax's cross-version compatibility guarantees; weights ride along as a
flat ``.npz``. The loader needs jax + numpy only (none of
``layoutdit_tpu``), and an artifact exported on a CPU host can target
TPU via ``platforms=("cpu", "tpu")``.

Artifact layout (one directory)::

    manifest.json         image_sizes, batch_size, jax/export versions
    params.npz            flat param leaves, insertion-ordered
    predict_<size>.bin    serialized Exported per serving bucket

Each bucket's function has signature
``(leaves: list[f32[...]], images: f32[B,3,S,S], orig: f32[B,2]) ->
{"boxes","scores","labels","valid"}`` with boxes already rescaled to
original page coordinates (eval/serving.py semantics).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_detector(
    params,
    cfg,
    path: str,
    image_sizes: Sequence[int] = (224,),
    batch_size: int = 8,
    platforms: Sequence[str] | None = None,
) -> dict:
    """Export ``detector_predict`` buckets to ``path``; returns the manifest."""
    import fsspec

    from layoutdit_tpu.models.detection.detector import (
        detector_predict,
        rescale_detections,
    )

    leaves, treedef = jax.tree_util.tree_flatten(params)
    specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    fs, root = fsspec.core.url_to_fs(path)
    fs.makedirs(root, exist_ok=True)

    for size in image_sizes:
        cfg_s = dataclasses.replace(cfg, image_size=size)

        def fn(leaf_list, images, orig, _cfg=cfg_s, _size=size):
            p = jax.tree_util.tree_unflatten(treedef, leaf_list)
            dets = detector_predict(p, images, _cfg)
            dets = rescale_detections(dets, orig, _size)
            return {
                "boxes": dets.boxes,
                "scores": dets.scores,
                "labels": dets.labels,
                "valid": dets.valid,
            }

        exported = jax_export.export(
            jax.jit(fn), platforms=tuple(platforms) if platforms else None
        )(
            specs,
            jax.ShapeDtypeStruct((batch_size, 3, size, size), jnp.float32),
            jax.ShapeDtypeStruct((batch_size, 2), jnp.float32),
        )
        with fs.open(os.path.join(root, f"predict_{size}.bin"), "wb") as f:
            f.write(exported.serialize())

    buf = {str(i): np.asarray(x) for i, x in enumerate(leaves)}
    with fs.open(os.path.join(root, "params.npz"), "wb") as f:
        np.savez(f, **buf)
    manifest = {
        "format": "layoutdit_tpu.export.v1",
        "image_sizes": list(image_sizes),
        "batch_size": batch_size,
        "num_leaves": len(leaves),
        # foreground classes, so a serving front end can label detections
        # without any model config (older artifacts lack the key)
        "num_classes": int(getattr(cfg, "num_classes", 0)) or None,
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
    }
    with fs.open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedDetector:
    """Loads and runs an exported artifact — no model code involved.

    ``predict(images, orig_sizes)`` routes on the static image size and
    returns numpy {"boxes", "scores", "labels", "valid"}; inputs must
    match the exported ``batch_size`` (pad the tail batch).
    """

    def __init__(self, path: str):
        import fsspec

        fs, root = fsspec.core.url_to_fs(path)
        with fs.open(os.path.join(root, "manifest.json")) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "layoutdit_tpu.export.v1":
            raise ValueError(f"{path} is not a layoutdit_tpu export artifact")
        with fs.open(os.path.join(root, "params.npz"), "rb") as f:
            npz = np.load(f)
            # device_put ONCE at load: leaving these as host numpy would
            # re-transfer the full parameter set (~344 MB at dit-base
            # fp32) on EVERY .call, serializing against the serving
            # pipeline's dispatch window
            self._leaves = [
                jax.device_put(npz[str(i)])
                for i in range(self.manifest["num_leaves"])
            ]
        self._fns = {}
        for size in self.manifest["image_sizes"]:
            with fs.open(os.path.join(root, f"predict_{size}.bin"), "rb") as f:
                self._fns[size] = jax_export.deserialize(f.read())

    @property
    def image_sizes(self) -> list[int]:
        return list(self._fns)

    def predict_async(self, images, orig_sizes) -> dict:
        """Like ``predict`` but returns device arrays without forcing a
        host sync — serving pipelines (eval/serving.py) dispatch batches
        ahead and fetch ``max_in_flight`` behind, so the transfer must
        not be forced here."""
        size = int(np.shape(images)[-1])
        if size not in self._fns:
            raise ValueError(
                f"no exported bucket for size {size}; have {self.image_sizes}"
            )
        return self._fns[size].call(
            self._leaves,
            jnp.asarray(images, jnp.float32),
            jnp.asarray(orig_sizes, jnp.float32),
        )

    def predict(self, images: np.ndarray, orig_sizes: np.ndarray) -> dict:
        out = self.predict_async(images, orig_sizes)
        return {k: np.asarray(v) for k, v in out.items()}
