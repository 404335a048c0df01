"""BlueSampler wavefront fast path: begin_wavefront's one-hot-matmul
precompute must reproduce the per-call gather formulation BIT-EXACTLY
(the golden gates depend on exact Heitz-Belcour table dispatch), and the
render path must produce identical images with and without it.
"""
import numpy as np

import jax
import jax.numpy as jnp

from pine_tpu.core.samplers import BlueSampler


def test_prepared_bit_exact():
    s = BlueSampler(16)
    assert s._bs_sobol is not None, "bluesobol assets missing"
    rng = np.random.default_rng(3)
    n = 2048
    px = jnp.asarray(rng.integers(0, 640, n), jnp.int32)
    py = jnp.asarray(rng.integers(0, 640, n), jnp.int32)
    # reference values from the unprepared path
    want = {}
    for d in (0, 1, 5, 17, 36, 63):
        for si in (0, 3, 15):
            want[(d, si)] = np.asarray(s.u1(px, py, si, d))
    s.begin_wavefront(px, py, 0, 16, max_dim=64)
    try:
        for (d, si), w in want.items():
            got = np.asarray(s.u1(px, py, jnp.int32(si), d))
            np.testing.assert_array_equal(got, w, err_msg=f"dim={d} si={si}")
    finally:
        s.end_wavefront()
    assert s._pre is None


def test_prepared_offset_slots():
    """sample_offset shifts the slot mapping (progressive batches)."""
    s = BlueSampler(16)
    assert s._bs_sobol is not None
    n = 512
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.integers(0, 128, n), jnp.int32)
    py = jnp.asarray(rng.integers(0, 128, n), jnp.int32)
    want = np.asarray(s.u1(px, py, 9, 7))
    s.begin_wavefront(px, py, 8, 8, max_dim=16)
    try:
        got = np.asarray(s.u1(px, py, jnp.int32(9), 7))
    finally:
        s.end_wavefront()
    np.testing.assert_array_equal(got, want)


def test_prepared_falls_back_on_foreign_pixels():
    """u1 with pixels other than the prepared wavefront uses the plain path."""
    s = BlueSampler(16)
    assert s._bs_sobol is not None
    n = 256
    px = jnp.arange(n, dtype=jnp.int32)
    py = jnp.arange(n, dtype=jnp.int32) * 3
    other = px + 1
    want = np.asarray(s.u1(other, py, 2, 4))
    s.begin_wavefront(px, py, 0, 16, max_dim=8)
    try:
        got = np.asarray(s.u1(other, py, 2, 4))
    finally:
        s.end_wavefront()
    np.testing.assert_array_equal(got, want)


def test_render_identical_with_prepared_sampler():
    """End-to-end: the wavefront render is bit-identical with the fast path
    (begin_wavefront is wired in render_wavefront) vs the sampler fallback
    (monkeypatched away)."""
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.prl.interp import Interpreter

    SRC = """
scene := Scene();
scene.add(Rect([0, 3, 0], [1.5, 0, 0], [0, 0, 1.5]), Emissive([6, 6, 6]));
scene.add(Sphere([0, 0.5, 0], 0.5), Diffuse([0.7, 0.6, 0.5]));
scene.add(Plane([0, 0, 0], [0, 1, 0]), Diffuse([0.6, 0.6, 0.6]));
scene.set(ThinLenCamera(Film([32, 32]), [0, 1, -3], [0, 0.5, 0], 0.35));
"""
    itp = Interpreter()
    itp.run(SRC, "<prep-test>")
    scene = itp.get_var("scene")
    cscene = scene.compile()
    s = BlueSampler(4)
    assert s._bs_sobol is not None
    from pine_tpu.integrators import path as path_mod

    img_fast = np.asarray(
        render_wavefront(cscene, scene.camera, 32, 32, s, 4, 3)
    )
    s2 = BlueSampler(4)
    s2.begin_wavefront = None  # getattr(..., None) gate in render_wavefront
    # the render cache keys on (scene, sampler-config, ...) and would reuse
    # the fast-path program: clear it so the fallback actually re-traces
    path_mod._RENDER_CACHE.clear()
    img_slow = np.asarray(
        render_wavefront(cscene, scene.camera, 32, 32, s2, 4, 3)
    )
    np.testing.assert_array_equal(img_fast, img_slow)
