"""CLI entry: ``python -m pine_tpu <file.pine>`` (parity: src/cli/pine.cpp).

Render progress is polled at 10 Hz from a watcher thread and reprinted as a
``\\r`` line, exactly like the reference's g_progress loop (pine.cpp:36-40);
the wavefront renderer updates it per film chunk.
"""
from __future__ import annotations

import sys
import time


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: pine <file.pine>")
        return 1
    path = argv[0]
    from pine_tpu.core.profiler import Profiler
    from pine_tpu.core.progress import ProgressReporter
    from pine_tpu.prl.interp import interpret_file

    import contextlib
    import os

    # PINE_TRACE=<dir>: capture a jax.profiler trace of the whole run
    # (SURVEY §5.1 — per-kernel timing beyond the phase profiler)
    trace_dir = os.environ.get("PINE_TRACE")
    if trace_dir:
        import jax

        trace_cm = jax.profiler.trace(trace_dir)
    else:
        trace_cm = contextlib.nullcontext()

    t0 = time.time()
    try:
        with trace_cm, Profiler("Total"), ProgressReporter():
            interpret_file(path)
    except Exception as e:  # mirror pine.cpp's catch-log behavior
        import os

        if os.environ.get("PINE_DEBUG"):
            import traceback

            traceback.print_exc()
        print(f"[Error] {e}")
        return 1
    Profiler.finalize()
    print(f"Finished in {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
