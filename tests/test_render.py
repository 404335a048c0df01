"""Golden-ish render tests: structural assertions on a small Cornell box
(SURVEY.md §4 implication: scene-as-test, automated)."""
import numpy as np
import pytest

import __graft_entry__ as ge
from pine_tpu.core.samplers import UniformSampler
from pine_tpu.integrators.path import render_wavefront


@pytest.fixture(scope="module")
def cbox_img():
    scene = ge._build_cbox(48)
    cscene = scene.compile()
    img = render_wavefront(
        cscene, scene.camera, 48, 48, UniformSampler(16), 16, 4
    )
    return np.asarray(img)


def test_not_black_and_finite(cbox_img):
    assert np.isfinite(cbox_img).all()
    assert cbox_img.mean() > 0.02


def test_wall_color_bleeding(cbox_img):
    # left third should be red-dominant, right third green-dominant
    h, w, _ = cbox_img.shape
    left = cbox_img[h // 4 : 3 * h // 4, : w // 6]
    right = cbox_img[h // 4 : 3 * h // 4, -w // 6 :]
    assert left[..., 0].mean() > left[..., 1].mean() * 1.5
    assert right[..., 1].mean() > right[..., 0].mean() * 1.5


def test_light_is_brightest_region(cbox_img):
    # the area light at the ceiling shows as the hottest pixels
    lum = cbox_img.sum(-1)
    ymax = np.unravel_index(np.argmax(lum), lum.shape)[0]
    # film row index == pixel y; y grows upward pre-save-flip, light is at the
    # ceiling so the hottest row sits in the upper part of the buffer
    assert ymax > 2 * cbox_img.shape[0] // 3
    # energy conservation sanity: average radiance bounded
    assert cbox_img.mean() < 5.0


def test_deterministic(cbox_img):
    scene = ge._build_cbox(48)
    cscene = scene.compile()
    img2 = np.asarray(
        render_wavefront(cscene, scene.camera, 48, 48, UniformSampler(16), 16, 4)
    )
    assert np.allclose(img2, cbox_img, atol=1e-5)


def test_prl_cbox_scene_end_to_end(tmp_path):
    """Run a PRL cornell-box script through the CLI pipeline."""
    from pine_tpu.prl.interp import Interpreter

    src = """
scene := Scene();
scene.add("floor", Diffuse([0.9, 0.9, 0.9]));
scene.add(Rect([0, 0, 1], [2, 0, 0], [0, 0, 2], true), "floor");
scene.add(Rect([0, 1.9, 1], [0.2, 0, 0], [0, 0, 0.2]), Emissive([100.0, 100, 100]));
scene.set(ThinLenCamera(Film([24, 24]), [0, 1, -3], [0, 1, 0], 0.4));
PathIntegrator(UniformSampler(4), 3).render(scene);
scene.camera.film().save("OUT");
"""
    out = str(tmp_path / "out.png")
    itp = Interpreter()
    itp.run(src.replace("OUT", out))
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (24, 24, 3)
    assert img.mean() > 1.0


def test_instancing_two_level():
    """Instancing (geometry.h:371-390): one mesh, two instances with distinct
    transforms and materials renders both with correct colors."""
    import jax.numpy as jnp

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import UniformSampler
    from pine_tpu.core.vecmath import scale, translate
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.scene import lights as L
    from pine_tpu.scene import materials as M
    from pine_tpu.scene import shapes as S
    from pine_tpu.scene.scene import Scene

    # a simple quad mesh (2 triangles)
    mesh = S.Mesh(
        [[-1, 0, 0], [1, 0, 0], [1, 2, 0], [-1, 2, 0]],
        [[0, 1, 2], [0, 2, 3]],
    )
    inst = S.InstancedShape(mesh)
    inst.add(translate([-1.2, 0, 0]) @ scale([0.8, 0.8, 1.0]), M.Diffuse([0.9, 0.1, 0.1]))
    inst.add(translate([1.2, 0, 0]) @ scale([0.8, 0.8, 1.0]), M.Diffuse([0.1, 0.9, 0.1]))
    sc = Scene()
    sc.add(inst)
    sc.add(L.DirectionalLight(np.asarray([0, 0.3, -1.0]), np.asarray([3.0, 3.0, 3.0])))
    sc.set(ThinLenCamera(Film([32, 32], "uncharted2"), [0, 1, -4], [0, 1, 0], 0.5))
    cscene = sc.compile()
    assert len(sc.geometries) == 2
    img = np.asarray(render_wavefront(cscene, sc.camera, 32, 32, UniformSampler(4), 4, 2))
    assert np.isfinite(img).all()
    left = img[:, :14].mean(axis=(0, 1))
    right = img[:, 18:].mean(axis=(0, 1))
    assert left[0] > 2 * left[1], left    # left instance is red
    assert right[1] > 2 * right[0], right  # right instance is green


def test_progressive_snapshots(tmp_path):
    """--progressive N: batched accumulation writes refining snapshots and
    the final mean equals the one-shot render (same sample set)."""
    import jax.numpy as jnp

    from pine_tpu.core import options
    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film, flush_deferred_saves
    from pine_tpu.core.samplers import UniformSampler
    from pine_tpu.integrators.path import PathIntegrator
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.scene import Scene

    def build():
        sc = Scene()
        sc.add(S.Rect([0, 2, 0], [1, 0, 0], [0, 0, 1]), M.Emissive([10, 10, 10]))
        sc.add(S.Sphere([0, 0, 0], 0.5), M.Diffuse([0.7, 0.6, 0.5]))
        sc.add(S.Plane([0, -0.5, 0], [0, 1, 0]), M.Diffuse([0.8, 0.8, 0.8]))
        sc.set(ThinLenCamera(Film([12, 12]), [0, 0.6, -2.5], [0, 0, 0], 0.5))
        return sc

    sc1 = build()
    PathIntegrator(UniformSampler(8), 2).render(sc1)
    ref = np.asarray(sc1.camera.film.finalized_device())

    options.progressive_every = 2
    options.progressive_dir = str(tmp_path)
    try:
        sc2 = build()
        PathIntegrator(UniformSampler(8), 2).render(sc2)
        flush_deferred_saves()
    finally:
        options.progressive_every = None
        options.progressive_dir = "progressive"
    import os

    snaps = sorted(f for f in os.listdir(tmp_path) if f.startswith("snap_"))
    assert len(snaps) == 4, snaps
    assert (tmp_path / "latest.png").exists()   # live-view target
    assert (tmp_path / "index.html").exists()   # auto-refreshing viewer page
    got = np.asarray(sc2.camera.film.finalized_device())
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
