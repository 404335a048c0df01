"""Decompose the dense cone-sweep kernel's per-prim cost on the real chip.

The cbox render is bound by the 424-cone group's dense sweep (~4 ms per
65k-ray query = ~250 VPU cycles per prim-block, far above the ~35 vector
ops the test itself needs).  This probe times the same sweep with parts of
the work removed to locate the cost:

  full      the real _test_cone + best_t/best_e select      (baseline)
  inva      candidate fix: one reciprocal feeds both roots  (vs 2 divides)
  nodiv     sqrt kept, divides replaced by multiplies       (divide cost)
  nosqrt    divides kept, sqrt replaced by a multiply       (sqrt cost)
  rawmath   all 8 fetches, polynomial only (no sqrt/div)    (splat+mul floor)
  onefetch  1 fetch, polynomial only                        (loop floor)
  noselect  full math, best_t/best_e updates dropped        (select cost)

All variants run the identical (65536 rays x 424 prims) sweep with real
fences (sync dispatch), CHAIN dependent calls per program so XLA cannot CSE.
Results are WRONG by construction for every variant except full/inva —
timing decomposition only.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

N_RAYS = int(os.environ.get("PROBE_RAYS", 65536))
CHAIN = int(os.environ.get("PROBE_CHAIN", 8))
BIG = 1e30


def _variant_test(name):
    import jax.numpy as jnp

    def finish(t, ok, tmin, tmax):
        return jnp.where(ok & (t > tmin) & (t < tmax), t, BIG)

    def cone(fetch, o, d, tmin, tmax):
        ax, ay, az = fetch(0), fetch(1), fetch(2)
        nx, ny, nz = fetch(3), fetch(4), fetch(5)
        A2, h = fetch(6), fetch(10)
        ox, oy, oz = o[0] - ax, o[1] - ay, o[2] - az
        dn = d[0] * nx + d[1] * ny + d[2] * nz
        on = ox * nx + oy * ny + oz * nz
        dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        od = ox * d[0] + oy * d[1] + oz * d[2]
        oo = ox * ox + oy * oy + oz * oz
        a = -A2 * dn * dn + dd
        b = 2.0 * (-A2 * on * dn + od)
        c = -A2 * on * on + oo
        disc = b * b - 4.0 * a * c
        if name == "rawmath":
            return finish(disc + dn + od, disc > 0.0, tmin, tmax)
        if name == "nosqrt":
            sq = disc * 0.5  # stand-in with ~1-mul cost
        else:
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        if name == "nodiv":
            a_safe = jnp.where(a == 0.0, 1e-6, a)
            t0 = (-b - sq) * (2.0 * a_safe)  # mul stand-in for the divide
            t = jnp.where(t0 < tmin, t0 + sq * a_safe, t0)
        elif name == "inva":
            # candidate fix: one reciprocal, both roots by multiplication
            inva = 0.5 / jnp.where(a == 0.0, 1e-6, a)
            t0 = (-b - sq) * inva
            t = jnp.where(t0 < tmin, t0 + 2.0 * sq * inva, t0)
        else:  # full / noselect / nosqrt
            a_safe = jnp.where(a == 0.0, 1e-6, a)
            t0 = (-b - sq) / (2.0 * a_safe)
            t = jnp.where(t0 < tmin, t0 + sq / a_safe, t0)
        height = on + t * dn
        ok = (disc > 0.0) & (height < 0.0) & (height >= -h)
        return finish(t, ok, tmin, tmax)

    def onefetch(fetch, o, d, tmin, tmax):
        ax = fetch(0)
        t = (o[0] - ax) * d[0] + (o[1] - ax) * d[1] + (o[2] - ax) * d[2]
        return finish(t, t > 0, tmin, tmax)

    return onefetch if name == "onefetch" else cone


@functools.lru_cache(maxsize=32)
def _probe_call(name, width, n_prims, n_rows):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    test = _variant_test(name)
    noselect = name == "noselect"

    def kernel(rows, ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmn[:]
        best_t = bt_in[:]
        best_e = be_in[:]
        acc = bt_in[:]
        for e in range(n_prims):
            tt = test(lambda c: rows[e * width + c], o, d, tmin, best_t)
            if noselect:
                acc = acc + tt  # keep the math live without selects
            else:
                better = tt < best_t
                best_t = jnp.where(better, tt, best_t)
                best_e = jnp.where(better, e, best_e)
        bt_out[:] = acc * 1e-30 + best_t if noselect else best_t
        be_out[:] = best_e

    K_SUB, K_LANE = 8, 128
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows // K_SUB,),
        in_specs=[ray_spec] * 10,
        out_specs=(ray_spec, ray_spec),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",
    )


def main():
    import jax
    import jax.numpy as jnp

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch
    from scripts_kernel_lab import build_cone_group, synth_rays

    engage_sync_dispatch()
    print(json.dumps({
        "backend": jax.default_backend(),
        "dispatch_overhead_ms": round(dispatch_overhead_ms(), 1),
    }), flush=True)

    g, lo, hi = build_cone_group()
    rows = np.asarray(g["rows_np"], np.float32)
    n_prims, width = rows.shape
    o, d = synth_rays(N_RAYS, "coherent", lo, hi)
    n_rows = N_RAYS // 128

    rows_flat = jnp.asarray(rows.reshape(-1))
    K = 128

    def prep(x):
        return jnp.asarray(np.asarray(x, np.float32).reshape(n_rows, K))

    args = (
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(np.full(N_RAYS, 1e-3)), prep(np.full(N_RAYS, BIG)),
    )
    bt0 = prep(np.full(N_RAYS, BIG))
    be0 = jnp.zeros((n_rows, K), jnp.int32)

    variants = sys.argv[1:] or [
        "full", "inva", "nodiv", "nosqrt", "rawmath", "onefetch", "noselect",
    ]
    ref_t = None
    for name in variants:
        call = _probe_call(name, width, n_prims, n_rows)

        def chain(bt, be):
            for _ in range(CHAIN):
                bt, be = call(rows_flat, *args, bt * 1.0 + 0.0, be * 0)
            return bt, be

        f = jax.jit(chain)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(bt0, be0))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(bt0, be0))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        per_call_ms = wall / CHAIN * 1e3
        cyc = per_call_ms * 1e-3 * 1.7e9 / (n_prims * (N_RAYS / 1024.0))
        rec = {
            "variant": name, "n_prims": n_prims,
            "per_call_ms": round(per_call_ms, 3),
            "cycles_per_prim_block": round(cyc, 1),
            "compile_s": round(compile_s, 1),
        }
        if name == "full":
            ref_t = np.asarray(out[0])
        elif name == "inva" and ref_t is not None:
            dev = float(np.max(np.abs(
                np.where(ref_t < BIG / 2, np.asarray(out[0]) - ref_t, 0.0)
            )))
            rec["max_dev_vs_full"] = dev  # must be ~0: same roots, fewer divs
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
