"""Print the merged effective config as JSON.

Debugging aid for the pydantic-merge chain (defaults <- gs:// config
<- LAYOUTDIT_CONFIG partial): shows exactly what a run would use.

  python -m layoutdit_tpu.tools.show_config [--diff]

--diff prints only fields that differ from the library defaults.
"""

from __future__ import annotations

import argparse
import json
import os


def _flatten(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Show the effective config")
    parser.add_argument("--diff", action="store_true",
                        help="only fields differing from defaults")
    args = parser.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.config.constructs import LayoutDitConfig

    cfg = get_layout_dit_config().model_dump(mode="json")
    if args.diff:
        defaults = _flatten(LayoutDitConfig().model_dump(mode="json"))
        flat = _flatten(cfg)
        cfg = {k: v for k, v in flat.items() if defaults.get(k) != v}
    print(json.dumps(cfg, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
