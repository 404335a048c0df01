"""Dispatch-mode control for the tunneled TPU backend.

The axon PJRT backend (TPU reached through a relay) has two dispatch modes
with radically different wall-clock behavior (measured by
scripts_backend_probe.py, 2026-08-17):

- **async (process start)**: dispatches return in ~0.03 ms, but every
  queued program pays ~2.5-3 s of queue service time before it actually
  executes, regardless of its size.  ``jax.block_until_ready`` and
  ``Array.is_ready`` do NOT fence in this mode — they report completion
  for buffers whose programs have not run.  Any wall-clock measured this
  way is dispatch-only fiction.
- **sync (after the first device->host readback)**: every dispatch blocks
  through real execution with ~30 ms round-trip overhead.  A 4-TFLOP
  matmul chain that "takes" 0.03 ms async and 3.1 s of queue time runs in
  59 ms here.  For any program heavier than a few ms of device work, sync
  mode is ~50-100x faster in wall-clock terms.

Earlier rounds interpreted the mode switch as "readbacks permanently
poison dispatch ~1000x" (the dispatch *latency* does go 0.03 ms -> 30 ms)
and carefully deferred all readbacks — which kept the process in the slow
queue and made block_until_ready-based benchmarks report dispatch time as
render time.  The fast path is the opposite: flip to sync mode at startup,
then measure and render with real fences.

Host callbacks (io_callback / pure_callback / debug.callback) are
UNIMPLEMENTED on this backend — io_callback hangs, debug.callback raises.
Mid-render host work must be driven from the host loop between dispatches.
"""
from __future__ import annotations

_engaged = False


def engage_sync_dispatch() -> bool:
    """Switch the axon/TPU client into synchronous dispatch mode.

    Does a one-element dispatch + readback, which permanently flips the
    client out of the async queue.  Idempotent; a no-op on backends whose
    fences work (cpu).  Returns True if the switch was performed.
    """
    global _engaged
    if _engaged:
        return False
    _engaged = True
    import jax

    if jax.default_backend() == "cpu":
        return False
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((1,), jnp.float32) + 1.0)
    return True


def dispatch_overhead_ms(n: int = 5) -> float:
    """Median wall of a trivial dispatch in the current mode (the fixed
    per-program cost a benchmark should expect on top of device time)."""
    import time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(f(x))
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2] * 1e3


def wait_for_device(timeout_s: float = 900.0) -> bool:
    """Initialize the JAX backend under a watchdog.

    Returns True once ``jax.devices()`` answers; False if initialization
    hangs past ``timeout_s`` (the relay-tunneled TPU blocks indefinitely in
    backend init when the tunnel is down — measured 2026-08-17).  Benchmark
    entry points call this first so an outage produces an honest JSON error
    record instead of a hung driver process.
    """
    import threading

    ok: list = []

    def _init():
        import jax

        ok.append(len(jax.devices()))

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)
