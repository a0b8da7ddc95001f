"""Kernel-dispatch policy shared by the Pallas-or-XLA ops.

'auto' implementations pick Pallas on TPU at trace time. Deployment export
lowers one program for several platforms (tpu + cpu), where Pallas kernels
cannot lower for the CPU target — ``portable_mode()`` forces every 'auto'
decision to the pure-XLA path for the duration of the export trace.
"""
from __future__ import annotations

import contextlib
import contextvars

_PORTABLE = contextvars.ContextVar("some_tpu_portable_lowering", default=False)


def portable() -> bool:
    return _PORTABLE.get()


@contextlib.contextmanager
def portable_mode():
    token = _PORTABLE.set(True)
    try:
        yield
    finally:
        _PORTABLE.reset(token)
