"""Config accessor with optional remote (GCS) JSON override.

Parity with /root/reference/src/layoutdit/configuration/__init__.py:10-34:
a process-wide singleton that first tries ``gs://layoutdit/layout_dit_config.json``
and falls back to pydantic defaults. Extended with a ``LAYOUTDIT_CONFIG``
env var pointing at a local/remote JSON file, which takes precedence and
works without GCS credentials.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from layoutdit_tpu.config.constructs import (  # noqa: F401  (re-exports)
    BackboneType,
    DataLoaderConfig,
    DetectionBudget,
    EvalConfig,
    LayoutDitConfig,
    MeshConfig,
    ModelConfig,
    PrecisionConfig,
    TrainingConfig,
)
from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

_layout_dit_config: Optional[LayoutDitConfig] = None

_REMOTE_CONFIG_PATH = "gs://layoutdit/layout_dit_config.json"


def read_config_from_path(
    path: str, required: bool = False
) -> Optional[LayoutDitConfig]:
    """Load a LayoutDitConfig from a local or fsspec path; None if absent.

    ``.yaml``/``.yml`` files parse as YAML (the reference's own TODO —
    README.md:75 "yaml config for improved human readability"); anything
    else parses as JSON, which is also valid YAML, so the JSON surface
    is unchanged.

    ``required=True`` (the explicit LAYOUTDIT_CONFIG path) RAISES on a
    missing file, missing pyyaml, or a parse error — a user who pointed
    at a config must never silently train on pydantic defaults. The
    lenient mode is only for the best-effort gs:// probe (reference
    parity: it tries GCS unconditionally and falls back)."""
    import fsspec

    try:
        fs, _, paths = fsspec.get_fs_token_paths(path)
        if not fs.exists(paths[0]):
            if required:
                raise FileNotFoundError(f"LAYOUTDIT_CONFIG={path} does not exist")
            return None
        with fs.open(paths[0], "r") as f:
            if paths[0].endswith((".yaml", ".yml")):
                try:
                    import yaml
                except ImportError as e:
                    raise RuntimeError(
                        f"{path} is YAML but pyyaml is not installed; "
                        "install pyyaml or use a JSON config"
                    ) from e
                config_dict = yaml.safe_load(f)
            else:
                config_dict = json.load(f)
    except Exception as e:  # credentials / network / parse problems
        if required:
            raise
        logger.warning("Could not read config from %s: %s", path, e)
        return None
    if not isinstance(config_dict, dict):
        if required:
            raise ValueError(f"Config at {path} is not a mapping")
        logger.warning("Config at %s is not a mapping; ignoring", path)
        return None
    return LayoutDitConfig(**config_dict)


def read_config_from_gcs_if_exists() -> Optional[LayoutDitConfig]:
    """Reference parity: configuration/__init__.py:10-20."""
    return read_config_from_path(_REMOTE_CONFIG_PATH)


def get_layout_dit_config() -> LayoutDitConfig:
    """Get the LayoutDitConfig singleton (reference: __init__.py:23-34)."""
    global _layout_dit_config
    if _layout_dit_config is None:
        env_path = os.getenv("LAYOUTDIT_CONFIG")
        if env_path:
            _layout_dit_config = read_config_from_path(env_path, required=True)
        if _layout_dit_config is None and os.getenv("LAYOUTDIT_SKIP_REMOTE_CONFIG") != "1":
            _layout_dit_config = read_config_from_gcs_if_exists()
        if _layout_dit_config is None:
            _layout_dit_config = LayoutDitConfig()
    return _layout_dit_config


def set_layout_dit_config(config: Optional[LayoutDitConfig]) -> None:
    """Replace (or clear, with None) the singleton — used by tests/CLI."""
    global _layout_dit_config
    _layout_dit_config = config
