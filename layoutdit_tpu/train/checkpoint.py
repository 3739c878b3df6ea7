"""Full-state checkpointing over fsspec (local or gs://).

The reference saves only bare ``state_dict`` weights and cannot truly
resume (no optimizer/epoch state — model.py:90-121, SURVEY.md §5). Here a
checkpoint is one msgpack blob holding params, optimizer state, epoch and
arbitrary extras, serialized with flax.serialization so any pytree
round-trips; restore validates against a template pytree.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

_MAGIC = b"LDTPU1\n"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any = None,
    epoch: int = 0,
    extra: Optional[dict] = None,
) -> None:
    import fsspec

    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else {},
        "meta": {
            "epoch": epoch,
            "extra": json.dumps(extra or {}),
            "has_opt_state": opt_state is not None,
        },
    }
    blob = serialization.to_bytes(payload)
    with fsspec.open(path, "wb", auto_mkdir=True) as f:
        f.write(_MAGIC + blob)


def load_checkpoint(
    path: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> dict:
    """Returns {"params", "opt_state" (None unless template given),
    "epoch", "extra"}."""
    import fsspec

    with fsspec.open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path} is not a layoutdit_tpu checkpoint")
    target = {
        "params": params_template,
        "opt_state": opt_state_template if opt_state_template is not None else {},
        "meta": {"epoch": 0, "extra": "{}", "has_opt_state": False},
    }
    payload = serialization.from_bytes(target, data[len(_MAGIC):])
    return {
        "params": payload["params"],
        "opt_state": payload["opt_state"] if opt_state_template is not None else None,
        "epoch": int(payload["meta"]["epoch"]),
        "extra": json.loads(payload["meta"]["extra"]),
    }
