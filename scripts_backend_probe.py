"""Characterize the tunneled TPU backend's dispatch modes (VERDICT r3
item 3, and the measurement methodology behind every recorded benchmark).

Findings on the axon PJRT backend (TPU v5 lite through a relay), measured
2026-08-17 by this script:

1. **Fences do not fence in the default (async) mode.**
   ``jax.block_until_ready`` and ``Array.is_ready`` return immediately for
   buffers whose programs have NOT executed: a chained 4x 8192^2 matmul
   program "completes" in 0.03-0.10 ms.  Any wall-clock timed this way is
   dispatch-only.
2. **Async-mode programs pay ~2.5-3 s of queue service EACH.**  Delta
   method (k dispatches + one terminal readback, subtracting walls across
   k in fresh processes): ~3.1 s per additional program whose true device
   time is 59 ms.  Background execution does proceed (a 20 s sleep absorbs
   it), but at the same ~3 s/program service rate.
3. **The first device->host readback permanently switches the process to
   synchronous dispatch.**  After it, each dispatch blocks through real
   execution: ~30 ms fixed round trip (29.5 ms for sub-ms programs),
   plus real device time (52-59 ms total for the 4-TFLOP matmul chain).
   This is the mode earlier rounds called "poisoned" (dispatch latency
   0.03 -> 30 ms, x1000) — but for real work it is ~50-100x FASTER in
   wall-clock than the async queue.  pine_tpu now engages it at CLI
   startup (core/device.engage_sync_dispatch).
4. **Host callbacks are unsupported**: ``io_callback`` hangs forever,
   ``debug.callback``/``pure_callback`` raise UNIMPLEMENTED
   ("axon_pjrt does not support host send/recv callbacks").  Live
   progressive snapshots therefore flush from the host loop between
   batch dispatches — free in sync mode (a film readback is an ordinary
   ~50 ms transfer at 640^2).

Each candidate runs in its OWN subprocess (the mode switch is process-wide
and permanent).  Prints one JSON line per candidate.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_WARM = 3
N_TIME = 10
SIZE = 1024


def _loop_ms(fn, x):
    import jax

    for _ in range(N_WARM):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(N_TIME):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / N_TIME * 1e3, x


def run_candidate(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def step(x):
        return jnp.tanh(x @ x) * 0.99 + 0.01

    x = jnp.ones((SIZE, SIZE), jnp.float32)

    if name in ("throughput_async", "throughput_sync"):
        # True per-program cost of a 4x 8192^2 matmul chain (59 ms of
        # device time) in each mode, via k dispatches + terminal readback.
        @jax.jit
        def big(y):
            for _ in range(4):
                y = jnp.tanh(y @ y) * 0.99 + 0.01
            return y

        y = jnp.ones((8192, 8192), jnp.float32)
        y = big(y)  # compile
        if name == "throughput_sync":
            np.asarray(y[:2, :2]).sum()  # switch to sync mode
        for k in (1, 4):
            t0 = time.perf_counter()
            ys = y
            for _ in range(k):
                ys = big(y)
            np.asarray(ys[:2, :2]).sum()
            print(json.dumps({
                "candidate": name, "k": k,
                "wall_ms": round((time.perf_counter() - t0) * 1e3, 1),
            }))
        return

    before_ms, x = _loop_ms(step, x)
    got = {"n": 0}

    def save_cb(arr):
        got["n"] += 1
        np.asarray(arr).sum()

    if name == "baseline":
        pass
    elif name == "readback":
        np.asarray(x[:8, :8]).sum()
    elif name == "io_callback":
        from jax.experimental import io_callback

        @jax.jit
        def step_snap(x):
            y = step(x)
            io_callback(save_cb, None, y[:64, :64], ordered=True)
            return y

        x = step_snap(x)
        jax.block_until_ready(x)
    elif name == "debug_callback":
        @jax.jit
        def step_snap(x):
            y = step(x)
            jax.debug.callback(save_cb, y[:64, :64])
            return y

        x = step_snap(x)
        jax.block_until_ready(x)
        time.sleep(0.5)
    else:
        raise SystemExit(f"unknown candidate {name}")

    after_ms, x = _loop_ms(step, x)
    print(json.dumps({
        "candidate": name,
        "dispatch_before_ms": round(before_ms, 3),
        "dispatch_after_ms": round(after_ms, 3),
        "dispatch_x": round(after_ms / before_ms, 2),
        "callback_fired": got["n"],
        "note": "dispatch latency only; fences do not fence in async mode",
    }))


def main():
    if len(sys.argv) > 1:
        run_candidate(sys.argv[1])
        return
    for name in (
        "baseline", "readback", "throughput_async", "throughput_sync",
        "io_callback", "debug_callback",
    ):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        out = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        for line in out:
            print(line)
        if not out:
            print(json.dumps(
                {"candidate": name, "error": (r.stderr or "no output")[-300:]}
            ))


if __name__ == "__main__":
    main()
