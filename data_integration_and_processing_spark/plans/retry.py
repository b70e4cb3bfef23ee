"""Driver-side retry for connector metadata operations (reference O14).

Parity with `/root/reference/decorators.py:5-40` (3 attempts, fixed 5 s
delay, log each failure, re-raise on exhaustion), with exponential backoff
added. Scope note: this guards *driver-side* calls only (JDBC DDL, catalog
probes). Task-level fault tolerance at scale is Spark's own
``spark.task.maxFailures`` — do not wrap distributed actions in this.
"""

from __future__ import annotations

import functools
import logging
import time
from collections.abc import Callable
from typing import Any, TypeVar

F = TypeVar("F", bound=Callable[..., Any])

_log = logging.getLogger(__name__)


def retry(
    retries: int = 3,
    delay: float = 5.0,
    backoff: float = 1.0,
    exceptions: tuple[type[BaseException], ...] = (Exception,),
    logger: logging.Logger | None = None,
) -> Callable[[F], F]:
    """Retry decorator: ``retries`` attempts, ``delay`` seconds between them,
    multiplied by ``backoff`` after each failure; re-raises the last error."""
    log = logger or _log

    def deco(fn: F) -> F:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            wait = delay
            for attempt in range(1, retries + 1):
                try:
                    return fn(*args, **kwargs)
                except exceptions as exc:
                    if attempt == retries:
                        log.error("%s failed after %d attempts: %s", fn.__name__, retries, exc)
                        raise
                    log.warning("%s attempt %d/%d failed (%s); retrying in %.1fs",
                                fn.__name__, attempt, retries, exc, wait)
                    time.sleep(wait)
                    wait *= backoff
            raise AssertionError("unreachable")

        return wrapper  # type: ignore[return-value]

    return deco
