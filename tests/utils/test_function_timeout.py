"""Execution-timeout tests (reference tests/utils/test_function_timeout.py, shortened sleeps)."""

import time

import pytest

from salve_tpu.utils.function_timeout import timeout


def test_timeout_raises() -> None:
    with pytest.raises(TimeoutError):
        with timeout(seconds=1):
            time.sleep(2)


def test_timeout_not_reached() -> None:
    with timeout(seconds=3):
        time.sleep(0.2)
