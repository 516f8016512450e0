"""Retry with exponential backoff — same algorithm as the reference's client
retry (JAVA/RetryUtil.java:28-73): base 1s doubling to a 10s cap, bounded
attempts, an unrecoverable-error list that fails fast, and server-ish errors
resetting the attempt counter."""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

BASE_BACKOFF_S = 1.0
MAX_BACKOFF_S = 10.0
MAX_RETRIES = 10


class UnrecoverableError(Exception):
    """Errors that must not be retried (the reference's unrecoverable code
    list: auth failures, missing project/store, malformed requests)."""


def retry_with_backoff(
    fn: Callable[[], T],
    *,
    max_retries: int = MAX_RETRIES,
    base_backoff_s: float = BASE_BACKOFF_S,
    max_backoff_s: float = MAX_BACKOFF_S,
    resets_counter: Callable[[Exception], bool] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` with the reference's backoff policy. ``resets_counter``
    mirrors the 5xx-resets-attempts behavior (RetryUtil.java:60-66)."""
    attempts = 0
    backoff = base_backoff_s
    while True:
        try:
            return fn()
        except UnrecoverableError:
            raise
        except Exception as e:  # noqa: BLE001 — retry layer is intentionally broad
            if resets_counter is not None and resets_counter(e):
                attempts = 0
            attempts += 1
            if attempts > max_retries:
                raise
            sleep(backoff)
            backoff = min(backoff * 2, max_backoff_s)
