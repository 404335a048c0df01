"""Logging/assertions (parity: src/pine/core/log.h).

Four severity streams as swappable callables (log.h:11-14), ``CHECK*``
helpers (log.h:53-96), debug-only ``DCHECK*`` gated on PINE_DEBUG, and a
wall-clock ``Timer`` (log.h:97-107).  ``SEVERE`` raises ``PineError`` after
logging, mirroring the reference's throw of ``pine::Exception``.
"""
from __future__ import annotations

import os
import sys
import time


class PineError(RuntimeError):
    """pine::Exception equivalent (log.h:45-50)."""


def _default_stream(msg):
    print(msg, file=sys.stderr)


# swappable stream function pointers (log.h:11-14); tests may override
streams = {
    "debug": _default_stream,
    "log": _default_stream,
    "warning": _default_stream,
    "severe": _default_stream,
}


def DEBUG(*args):
    if os.environ.get("PINE_DEBUG"):
        streams["debug"]("[debug] " + " ".join(str(a) for a in args))


def LOG(*args):
    streams["log"](" ".join(str(a) for a in args))


def WARNING(*args):
    streams["warning"]("[warning] " + " ".join(str(a) for a in args))


def SEVERE(*args):
    msg = " ".join(str(a) for a in args)
    streams["severe"]("[severe] " + msg)
    raise PineError(msg)


def CHECK(cond, *args):
    if not cond:
        SEVERE("check failed:", *args)


def CHECK_EQ(a, b, *args):
    if not a == b:
        SEVERE(f"check failed: {a!r} == {b!r}", *args)


def CHECK_NE(a, b, *args):
    if not a != b:
        SEVERE(f"check failed: {a!r} != {b!r}", *args)


def CHECK_LT(a, b, *args):
    if not a < b:
        SEVERE(f"check failed: {a!r} < {b!r}", *args)


def CHECK_LE(a, b, *args):
    if not a <= b:
        SEVERE(f"check failed: {a!r} <= {b!r}", *args)


def CHECK_GT(a, b, *args):
    if not a > b:
        SEVERE(f"check failed: {a!r} > {b!r}", *args)


def CHECK_GE(a, b, *args):
    if not a >= b:
        SEVERE(f"check failed: {a!r} >= {b!r}", *args)


def _noop(*args, **kw):
    pass


if os.environ.get("PINE_DEBUG"):
    DCHECK, DCHECK_EQ, DCHECK_LT, DCHECK_GE = CHECK, CHECK_EQ, CHECK_LT, CHECK_GE
else:  # debug-only checks compile out in release (log.h:74-96)
    DCHECK = DCHECK_EQ = DCHECK_LT = DCHECK_GE = _noop


class Timer:
    """Wall-clock timer (log.h:97-107)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed_ms(self):
        return (time.perf_counter() - self.t0) * 1000.0

    def reset(self):
        out = self.elapsed_ms()
        self.t0 = time.perf_counter()
        return out
