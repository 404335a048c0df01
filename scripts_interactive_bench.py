"""Measure the interactive fly-cam's camera-move -> frame latency on the
real chip (VERDICT r3 item 4 'sub-second camera-move->frame on TPU cbox
640^2 x 1spp').

Drives the CLI exactly as a user would: a cbox scene at 640^2, --interactive,
keys scripted via PINE_INTERACTIVE_KEYS (WASD moves + look keys + quit), ANSI
preview off.  Every keypress re-dispatches the one compiled wavefront
program at the new camera arguments; the printed 'ms/frame' values are the
in-loop perf_counter walls around the blocked render dispatch (the first is
the spp=1 compile, excluded from the median).  Writes
INTERACTIVE_BENCH.json.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

SCENE = """
scene := Scene();
scene.add(Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), Diffuse([0.9, 0.9, 0.9]));
scene.add(Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), Diffuse([0.9, 0.9, 0.9]));
scene.add(Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), Diffuse([0.9, 0.1, 0.05]));
scene.add(Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), Diffuse([0.2, 0.9, 0.05]));
scene.add(Rect([0, 1, 2], [2, 0, 0], [0, 2, 0]), Diffuse([0.9, 0.9, 0.9]));
scene.add(Sphere([0.35, 0.45, 1.2], 0.45), Metal([1, 1, 1], 0.1));
scene.add(Sphere([-0.45, 0.35, 0.8], 0.35), Diffuse([0.8, 0.7, 0.5]));
scene.add(Rect([0, 1.98, 1.0], [0.3, 0, 0], [0, 0, 0.3]), Emissive([30, 28, 26]));
scene.set(ThinLenCamera(Film([640, 640]), [0, 1, -2.6], [0, 1, 1], 0.44));
PathIntegrator(BlueSampler(1), 4).render(scene);
"""


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    smoke = "--smoke" in sys.argv  # plumbing check on CPU: tiny film
    scene = SCENE.replace("[640, 640]", "[64, 64]") if smoke else SCENE
    scene_path = tempfile.mktemp(suffix=".pine")
    with open(scene_path, "w") as f:
        f.write(scene)
    env = dict(os.environ)
    env.update(
        PINE_INTERACTIVE_KEYS="wwassdijklq",  # 10 camera moves, then quit
        PINE_TERM_PREVIEW="0",
        # APPEND to PYTHONPATH: the container wires the TPU plugin through
        # it (/root/.axon_site sitecustomize) — replacing it kills the backend
        PYTHONPATH=here + os.pathsep + env.get("PYTHONPATH", ""),
    )
    argv = [sys.executable, "-m", "pine_tpu", scene_path, "--interactive"]
    if smoke:
        argv.append("--platform")
        argv.append("cpu")
    r = subprocess.run(
        argv, capture_output=True, text=True, timeout=3000, env=env, cwd=here,
    )
    out = r.stdout + r.stderr
    ms = [float(m) for m in re.findall(r"(\d+\.\d)\s*ms/frame", out)]
    if r.returncode != 0 or len(ms) < 3:
        print(out[-2000:])
        raise SystemExit(f"interactive bench failed rc={r.returncode} frames={len(ms)}")
    moves = sorted(ms[1:])  # drop the first frame (spp=1 compile)
    med = moves[len(moves) // 2]
    rec = {
        "metric": "interactive fly-cam camera-move->frame wall, cbox "
                  + ("64x64 (CPU smoke)" if smoke else "640x640")
                  + " x1spp depth4",
        "value": round(med, 1),
        "unit": "ms",
        "frames": len(moves),
        "min_ms": moves[0],
        "max_ms": moves[-1],
        "first_frame_compile_ms": round(ms[0], 1),
        "sub_second": med < 1000.0,
        "source": "scripts_interactive_bench.py: CLI --interactive with scripted keys"
                  " (PINE_INTERACTIVE_KEYS); each keypress re-dispatches the one"
                  " compiled wavefront program at new camera jit arguments",
    }
    with open(os.path.join(here, "INTERACTIVE_BENCH.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
