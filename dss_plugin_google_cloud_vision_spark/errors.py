# -*- coding: utf-8 -*-
"""Error taxonomy and error-handling modes for the extraction engine.

Mirrors the observable error contract of the reference plugin
(reference: python-lib/plugin_io_utils.py:31-36 ``ErrorHandling``,
python-lib/parallelizer.py:35-38 ``BatchError``,
python-lib/parallelizer.py:72-75 module-qualified error types,
python-lib/google_vision_api_client.py DocumentSplitError usage) without
importing any reference code.
"""

from __future__ import annotations

import inspect
from enum import Enum


class ErrorHandling(Enum):
    """How row/batch-level extraction errors are handled.

    LOG (default): capture the error in the row's error columns and keep
    going. FAIL: re-raise, aborting the Spark task (and therefore the job
    after ``spark.task.maxFailures``).
    """

    LOG = "Log"
    FAIL = "Fail"


class BatchError(ValueError):
    """Raised under ``ErrorHandling.FAIL`` when any row of a batch failed."""


class ExtractionError(Exception):
    """A document could not be extracted (undecodable, empty, unsupported)."""


class DocumentSplitError(Exception):
    """A multi-page binary payload could not be split into pages."""


class ExternalAPIError(Exception):
    """Stand-in for a remote-service failure (used by parity tests; the
    reference asserts the fully module-qualified name of its API exception,
    reference: tests/python/unit/test_parallelizer.py:39)."""


def qualified_error_type(error: BaseException) -> str:
    """Fully-qualified error type string, e.g.
    ``dss_plugin_google_cloud_vision_spark.errors.ExternalAPIError`` for
    module-level exceptions but bare ``ValueError`` for builtins — the
    reference's ``inspect.getmodule``-based rule
    (reference: python-lib/parallelizer.py:72-75)."""
    error_type = str(type(error).__qualname__)
    module = inspect.getmodule(error)
    if module is not None:
        error_type = str(module.__name__) + "." + error_type
    return error_type
