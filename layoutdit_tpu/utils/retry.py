"""Retry-with-backoff for flaky storage IO.

The reference has no failure handling at all (SURVEY.md §5: "No try/except
around training, no retry on GCS I/O"). Streaming training from GCS hits
transient 5xx/connection errors as a matter of course; every storage read
on the input path goes through ``retry_io``.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, TypeVar

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

T = TypeVar("T")


def retry_io(
    fn: Callable[..., T] | None = None,
    *,
    attempts: int = 4,
    base_delay: float = 0.5,
    exceptions: tuple = (OSError, IOError),
) -> Callable:
    """Decorator (or wrapper) retrying transient IO errors with exponential
    backoff. Non-IO exceptions propagate immediately."""

    def deco(f: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(f)
        def wrapped(*args, **kwargs) -> T:
            delay = base_delay
            for attempt in range(attempts):
                try:
                    return f(*args, **kwargs)
                except exceptions as e:
                    if attempt == attempts - 1:
                        raise
                    logger.warning(
                        "IO error in %s (attempt %d/%d): %s — retrying in %.1fs",
                        getattr(f, "__name__", "fn"), attempt + 1, attempts,
                        e, delay,
                    )
                    time.sleep(delay)
                    delay *= 2
            raise AssertionError("unreachable")

        return wrapped

    return deco(fn) if fn is not None else deco
