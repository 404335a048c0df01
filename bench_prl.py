"""PRL host-script JIT benchmark: scenes/benchmark.pine (Collatz).

The reference positions PRL against C and numba with this exact script
(scenes/benchmark.{pine,c,py}; LLVM O3 JIT jit.cpp:2219-2354).  Here the
eager interpreter's loop_jit tier vectorizes the 49,999 independent Collatz
chains into one lax.while_loop slab on the host CPU and re-dispatches it for
the 100 outer iterations.

Prints one JSON line: wall seconds for the full 100x50k benchmark plus the
multiple vs a gcc -O3 build of the reference's benchmark.c measured on this
same machine (when gcc is available).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXPECTED = "502498700"  # gcc -O3 benchmark.c output (i32 semantics)


def run_prl():
    from pine_tpu.prl.interp import Interpreter

    src = open(os.path.join(os.path.dirname(__file__), "scenes/benchmark.pine")).read()
    out = []
    t0 = time.perf_counter()
    Interpreter(out=out.append).run(src)
    wall = time.perf_counter() - t0
    assert out == [EXPECTED], f"wrong result: {out}"
    return wall


def run_c():
    cref = "/root/reference/scenes/benchmark.c"
    if not os.path.exists(cref):
        return None
    with tempfile.TemporaryDirectory() as d:
        exe = os.path.join(d, "bench")
        try:
            subprocess.run(["gcc", "-O3", "-o", exe, cref], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
        t0 = time.perf_counter()
        r = subprocess.run([exe], capture_output=True, text=True)
        wall = time.perf_counter() - t0
        assert r.stdout.strip() == EXPECTED
        return wall


def main():
    wall = run_prl()
    c_wall = run_c()
    rec = {
        "metric": "prl_collatz_wall_s",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(wall / c_wall, 2) if c_wall else None,
        "c_O3_wall_s": round(c_wall, 3) if c_wall else None,
        "note": "scenes/benchmark.pine 100x50k Collatz; vs_baseline = multiple of gcc -O3 wall on this host",
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
