"""Storage-path join that is correct for both local paths and URLs.

The reference joins ``gs://`` roots with ``os.path.join`` (e.g.
evaluator.py:301-302), which happens to work on POSIX only because
``os.sep`` is ``/``. ``join_path`` is explicit: URL-style roots
(anything with a ``scheme://``) are joined with ``/`` regardless of
platform; plain paths go through ``os.path.join``.
"""

from __future__ import annotations

import os
import re

_URL_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def join_path(root: str, *parts: str) -> str:
    if _URL_RE.match(root):
        segs = [root.rstrip("/")] + [p.strip("/") for p in parts]
        return "/".join(segs)
    return os.path.join(root, *parts)
