"""CLI entry: ``python -m pine_tpu <file.pine>`` (parity: src/cli/pine.cpp).

Render progress is polled at 10 Hz from a watcher thread and reprinted as a
``\\r`` line, exactly like the reference's g_progress loop (pine.cpp:36-40);
the wavefront renderer updates it per film chunk.
"""
from __future__ import annotations

import sys
import time


USAGE = """usage: pine <file.pine> [--platform P] [--progressive N] [--progressive-dir DIR]
            [--interactive]

--platform P         force the JAX backend: cpu or tpu.  The container may
                     pin JAX_PLATFORMS in the environment (sitecustomize runs
                     before any env-var override can take effect), so this
                     flag goes through jax.config.update, which wins.
--progressive N      snapshot the film every N samples per pixel (the
                     TPU-native analog of the reference's interactive
                     accumulation viewer, path_opengl.cpp:11-127);
                     snapshots are written to disk live as each batch
                     finishes, on every backend
--progressive-dir D  snapshot directory (default: progressive/)
--interactive        after the script's first render, open a terminal
                     fly-camera loop (WASD move, E/C up/down, IJKL look,
                     [ ] spp, p screenshot, q quit) re-dispatching the
                     compiled render at each new camera; frames go to
                     interactive/latest.png + a self-refreshing index.html
                     on CPU backends (path_opengl.cpp:104-117)"""


def _select_platform(name: str) -> None:
    """Force the backend via jax.config (env vars are too late: the
    container's sitecustomize pins JAX_PLATFORMS before user code runs)."""
    import jax

    if name == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif name == "tpu":
        jax.config.update("jax_platforms", "tpu")
    else:
        raise SystemExit(f"error: --platform must be cpu or tpu, got {name!r}")


def main(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]
    from pine_tpu.core import options

    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--platform":
            if i + 1 >= len(argv):
                print("error: --platform requires cpu or tpu")
                return 1
            _select_platform(argv[i + 1])
            i += 2
        elif a == "--interactive":
            options.interactive = True
            i += 1
        elif a == "--progressive":
            if i + 1 >= len(argv) or not argv[i + 1].isdigit() or int(argv[i + 1]) < 1:
                print("error: --progressive requires a positive integer")
                return 1
            options.progressive_every = int(argv[i + 1])
            i += 2
        elif a == "--progressive-dir":
            if i + 1 >= len(argv):
                print("error: --progressive-dir requires a path")
                return 1
            options.progressive_dir = argv[i + 1]
            i += 2
        else:
            args.append(a)
            i += 1
    if len(args) != 1:
        print(USAGE)
        return 1
    path = args[0]
    # Tunneled-TPU fast path: flip the axon client into synchronous
    # dispatch before any render work.  In the default async mode every
    # program pays ~3 s of queue service and no fence works; in sync mode
    # dispatches block through real execution (~30 ms overhead) and film
    # readbacks (saves, progressive snapshots, interactive frames) are
    # ordinary transfers.  See core/device.py for the measurements.
    from pine_tpu.core.device import engage_sync_dispatch

    engage_sync_dispatch()
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
    expect = os.environ.get("PINE_ASSERT_BACKEND")
    if expect:  # test hook: prove which backend actually ran
        import jax

        got = jax.default_backend()
        if got != expect:
            print(f"[Error] backend assertion: expected {expect}, got {got}")
            return 1
    print(f"Finished in {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
