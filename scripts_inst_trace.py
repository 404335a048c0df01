"""One profiled depth-1 instanced render on the real chip.

Captures a jax.profiler trace of the steady-state (post-compile) render and
prints the top device ops by total duration, parsed straight from the
trace.json.gz — no TensorBoard needed.  Timing triage only.

  python scripts_inst_trace.py [depth]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    import jax

    from pine_tpu.core.device import engage_sync_dispatch, wait_for_device

    if not wait_for_device(600.0):
        print(json.dumps({"error": "device unreachable"}))
        return
    engage_sync_dispatch()

    import bench_instanced as BI
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    scene, _, _ = BI.build_scene()
    cscene = scene.compile()
    sampler = BlueSampler(BI.SPP)

    img = render_wavefront(
        cscene, scene.camera, BI.W, BI.H, sampler, BI.SPP, depth, nee=False
    )
    jax.block_until_ready(img)

    tdir = "/tmp/inst_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        img = render_wavefront(
            cscene, scene.camera, BI.W, BI.H, sampler, BI.SPP, depth,
            nee=False,
        )
        jax.block_until_ready(img)

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print(json.dumps({"error": "no trace written", "dir": tdir}))
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    # device-lane complete events only (pid/tid with durations)
    tot = {}
    cnt = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        tot[name] = tot.get(name, 0) + ev["dur"]
        cnt[name] = cnt.get(name, 0) + 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({"depth": depth, "trace": paths[0]}))
    for name, us in top:
        print(json.dumps({
            "op": name[:110], "total_ms": round(us / 1e3, 2), "n": cnt[name],
        }))


if __name__ == "__main__":
    main()
