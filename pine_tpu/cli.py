"""CLI entry: ``python -m pine_tpu <file.pine>`` (parity: src/cli/pine.cpp).

The reference prints render progress at 10 Hz from a polling thread; the
wavefront renderer executes whole frames per XLA dispatch, so progress is
reported per render phase instead.
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
    from pine_tpu.prl.interp import interpret_file

    t0 = time.time()
    try:
        with Profiler("Total"):
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
