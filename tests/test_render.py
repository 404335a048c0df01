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
