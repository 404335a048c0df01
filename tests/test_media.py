"""Grid-media tests: NanoVDB reader round-trip, delta/ratio tracking
statistics vs analytic constant-density results, and an end-to-end chromatic
cloud render (VERDICT r1 item 7)."""
from __future__ import annotations

import tempfile

import numpy as np
import pytest


def test_nvdb_roundtrip():
    from pine_tpu.io.nvdb import read_nvdb_density, write_nvdb_dense

    rng = np.random.default_rng(0)
    dens = (rng.random((16, 16, 16)) < 0.3) * rng.random((16, 16, 16))
    dens = dens.astype(np.float32)
    path = tempfile.mktemp(suffix=".nvdb")
    write_nvdb_dense(path, dens)
    d2, bbox = read_nvdb_density(path)
    assert np.array_equal(dens, d2)
    assert bbox.tolist() == [[0, 0, 0], [16, 16, 16]]


def test_grid_tracking_matches_analytic():
    """Constant density: ratio-tracked transmittance and delta-tracked scatter
    fraction must match exp(-sigma*t) (medium.cpp:204-290 semantics)."""
    import jax.numpy as jnp

    from pine_tpu.scene.media import GridMedium, HgPhaseFunction
    from pine_tpu.scene.media_track import grid_sample_scatter, grid_transmittance

    m = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    med = GridMedium(
        np.ones((8, 8, 8), np.float32), m, HgPhaseFunction(0.0),
        [0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
    )
    N = 20000
    ro = jnp.asarray(np.tile([[0.5, 0.5, -1.0]], (N, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (N, 1)).astype(np.float32))
    key = jnp.asarray(np.arange(N, dtype=np.uint32))
    tmax = jnp.full((N,), 10.0)
    tr = float(np.asarray(grid_transmittance(med, ro, rd, tmax, key)).mean())
    assert abs(tr - np.exp(-2.0)) < 0.01, tr
    sc, ts, w, ab = grid_sample_scatter(med, ro, rd, tmax, key)
    frac = float(np.asarray(sc).mean())
    assert abs(frac - (1 - np.exp(-2.0))) < 0.01, frac
    assert float(np.asarray(ab).mean()) == 0.0  # sigma_a = 0: never absorbed
    # conditional mean free path inside [0,2]
    tsv = np.asarray(ts)[np.asarray(sc)] - 1.0
    analytic = (1 - 3 * np.exp(-2)) / (1 - np.exp(-2))
    assert abs(tsv.mean() - analytic) < 0.03, tsv.mean()


def test_grid_absorption_kills():
    import jax.numpy as jnp

    from pine_tpu.scene.media import GridMedium, HgPhaseFunction
    from pine_tpu.scene.media_track import grid_sample_scatter

    m = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    med = GridMedium(
        np.ones((8, 8, 8), np.float32), m, HgPhaseFunction(0.0),
        [1.0, 1.0, 1.0], [0.0, 0.0, 0.0],  # pure absorber
    )
    N = 4000
    ro = jnp.asarray(np.tile([[0.5, 0.5, -1.0]], (N, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (N, 1)).astype(np.float32))
    key = jnp.asarray(np.arange(N, dtype=np.uint32))
    sc, ts, w, ab = grid_sample_scatter(med, ro, rd, jnp.full((N,), 10.0), key)
    assert float(np.asarray(sc).mean()) == 0.0
    assert abs(float(np.asarray(ab).mean()) - (1 - np.exp(-2.0))) < 0.02


def test_cloud_render_end_to_end():
    """VDBMedium through PRL: chromatic multiple scattering renders finite
    and colored by sigma_s (blue-heavy here)."""
    from pine_tpu.core.samplers import UniformSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.io.nvdb import write_nvdb_dense
    from pine_tpu.prl.interp import Interpreter

    rng = np.random.default_rng(1)
    n = 16
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n - 0.5
    r = np.linalg.norm(g, axis=0)
    dens = (np.clip((0.4 - r) * 4, 0, 1) * 2).astype(np.float32)
    path = tempfile.mktemp(suffix=".nvdb")
    write_nvdb_dense(path, dens)
    src = f"""
scene := Scene();
scene.add("w", Diffuse([0.9, 0.9, 0.9]));
scene.add(Rect([0, 0, 1], [3, 0, 0], [0, 0, 3]), "w");
scene.add(VDBMedium('{path}', translate([-0.75, 0.1, 0.25]) * scale([1.5, 1.5, 1.5]), CloudPF(0.8), [0,0,0], [10, 20, 40]));
scene.add(Rect([0, 2.5, 1], [0.8, 0, 0], [0, 0, 0.8]), Emissive([40,40,40]));
scene.set(ThinLenCamera(Film([24, 24], Uncharted2()), [0, 1, -3.2], [0, 0.8, 0.5], 0.4));
"""
    itp = Interpreter()
    itp.run(src, "<cloud>")
    scene = itp.get_var("scene")
    cscene = scene.compile()
    assert len(cscene.grid_media) == 1
    img = np.asarray(
        render_wavefront(cscene, scene.camera, 24, 24, UniformSampler(8), 8, 5)
    )
    assert np.isfinite(img).all()
    mid = img[8:16, 8:16].mean(axis=(0, 1))
    assert mid[2] > mid[0] * 1.5, mid  # sigma_s blue-dominant -> blue cloud
    assert mid.sum() > 0.05
