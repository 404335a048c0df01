"""Run every TPU-gated measurement pending on the tunnel, in order.

One process per bench (each engages sync dispatch and the TPU worker state
is per-process); serialized because the tunnel serves one program at a time
and honest walls need an idle device.  Each step is guarded by
wait_for_device so an outage mid-queue produces error records, not hangs.

Order: cheapest-first so a short tunnel window still yields data.
Results land in the usual JSON files; a combined log goes to
/tmp/tpu_queue.log.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

STEPS = [
    # (label, argv, timeout_s)
    ("bench.py (cbox headline)", [sys.executable, "bench.py"], 3600),
    ("bench_mesh.py (terrain, post-fix re-verify)",
     [sys.executable, "bench_mesh.py"], 5400),
    ("bench_instanced.py (two-level kernel)",
     [sys.executable, "bench_instanced.py"], 5400),
    ("bench_instanced.py --big (10201 instances, no cap)",
     [sys.executable, "bench_instanced.py", "--big"], 7200),
    ("render A/B: cbox cell-culled dense (scdense) vs dense",
     [sys.executable, "scripts_render_ab.py", "cbox-scd"], 7200),
    ("bench_cloud.py (stretch 1080p x 256spp chromatic cloud)",
     [sys.executable, "bench_cloud.py"], 10800),
]


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pine_tpu.core.device import wait_for_device

    log = open("/tmp/tpu_queue.log", "a", buffering=1)

    def say(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        log.write(line + "\n")

    for label, argv, tmo in STEPS:
        say(f"probe tunnel before: {label}")
        if not wait_for_device(120.0):
            say("tunnel down; skipping remaining steps")
            break
        say(f"START {label}")
        t0 = time.time()
        try:
            r = subprocess.run(argv, timeout=tmo, capture_output=True, text=True)
            tail = (r.stdout or "")[-2000:] + (r.stderr or "")[-1000:]
            say(f"DONE rc={r.returncode} {time.time() - t0:.0f}s {label}\n{tail}")
        except subprocess.TimeoutExpired:
            say(f"TIMEOUT {tmo}s {label}")
    say("queue finished")


if __name__ == "__main__":
    main()
