import jax.numpy as jnp
import numpy as np
import pytest

from pine_tpu.scene import intersect as I
from pine_tpu.scene import shapes as S
from pine_tpu.core.vecmath import translate, rotate_y, scale


def _rays(o, d):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    n = o.shape[0]
    return o, d, jnp.zeros((n, 1)), jnp.full((n, 1), 1e30)


def _t(shape, o, d):
    params = jnp.asarray(shape.params())[None]
    ro, rd, tmin, tmax = _rays(o, d)
    t = I.INTERSECT[shape.type_id](params, ro, rd, tmin, tmax)
    return np.asarray(t)[:, 0]


def test_sphere_hit_miss():
    sph = S.Sphere([0, 0, 5], 1.0)
    t = _t(sph, [[0, 0, 0], [0, 3, 0]], [[0, 0, 1], [0, 0, 1]])
    assert t[0] == pytest.approx(4.0, abs=1e-4)
    assert t[1] >= I.BIG


def test_sphere_inside():
    sph = S.Sphere([0, 0, 0], 2.0)
    t = _t(sph, [[0, 0, 0]], [[0, 0, 1]])
    assert t[0] == pytest.approx(2.0, abs=1e-4)


def test_rect_hit_uv_bounds():
    r = S.Rect([0, 0, 2], [2, 0, 0], [0, 2, 0])
    t = _t(r, [[0, 0, 0], [1.1, 0, 0], [0.9, 0.9, 0]], [[0, 0, 1]] * 3)
    assert t[0] == pytest.approx(2.0, abs=1e-4)
    assert t[1] >= I.BIG  # outside half-extent 1
    assert t[2] == pytest.approx(2.0, abs=1e-4)


def test_plane_disk():
    pl = S.Plane([0, -1, 0], [0, 1, 0])
    t = _t(pl, [[0, 0, 0]], [[0, -1, 0]])
    assert t[0] == pytest.approx(1.0, abs=1e-5)
    dk = S.Disk([0, 0, 3], [0, 0, -1], 0.5)
    t = _t(dk, [[0.4, 0, 0], [0.6, 0, 0]], [[0, 0, 1]] * 2)
    assert t[0] == pytest.approx(3.0, abs=1e-4)
    assert t[1] >= I.BIG


def test_aabb_entry_exit():
    b = S.BoxAABB([-1, -1, 2], [1, 1, 4])
    t = _t(b, [[0, 0, 0], [0, 0, 3]], [[0, 0, 1]] * 2)
    assert t[0] == pytest.approx(2.0, abs=1e-4)
    # starting inside: reports the exit distance
    assert t[1] == pytest.approx(1.0, abs=1e-4)


def test_obb_matches_transformed_aabb():
    m = translate([0, 0, 3]) @ rotate_y(0.3) @ scale([1, 2, 1])
    obb = S.BoxOBB(S.BoxAABB([-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]), m)
    t = _t(obb, [[0, 0, 0]], [[0, 0, 1]])
    assert 2.0 < t[0] < 3.0


def test_triangle():
    tr = S.Triangle([-1, -1, 2], [1, -1, 2], [0, 1, 2])
    t = _t(tr, [[0, 0, 0], [0.9, 0.9, 0]], [[0, 0, 1]] * 2)
    assert t[0] == pytest.approx(2.0, abs=1e-4)
    assert t[1] >= I.BIG


def test_cone():
    c = S.Cone([0, 0, 0], [0, 1, 0], 1.0, 2.0)
    t = _t(c, [[0, 1, -5]], [[0, 0, 1]])
    # at height y=1 the cone radius is 0.5
    assert t[0] == pytest.approx(4.5, abs=1e-3)


def test_cylinder():
    c = S.Cylinder([0, 0, 0], [0, 2, 0], 0.5)
    t = _t(c, [[0, 1, -4], [0, 3, -4]], [[0, 0, 1]] * 2)
    assert t[0] == pytest.approx(3.5, abs=1e-3)
    assert t[1] >= I.BIG


def test_line():
    ln = S.Line([0, 0, 0], [0, 2, 0], 0.3)
    t = _t(ln, [[0, 1, -4]], [[0, 0, 1]])
    # reference Line::intersect reports the clamped closest-point depth,
    # which is exactly the distance to the segment axis here
    assert 3.5 < t[0] <= 4.001
    t_miss = _t(ln, [[0, 1, -4]], [[0, 1, 0]])
    assert t_miss[0] >= I.BIG


def test_surface_info_sphere_normal():
    sph = S.Sphere([0, 0, 5], 1.0)
    rows = jnp.asarray(sph.params())[None]
    p = jnp.asarray([[0.0, 0.0, 4.0]])
    pc, n, uv = I.surface_info_sphere(rows, p)
    assert np.allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-5)


def test_rect_sample_pdf_consistency():
    r = S.Rect([0, 2, 0], [1, 0, 0], [0, 0, 1])
    rows = jnp.asarray(np.stack([r.params()] * 4))
    p = jnp.asarray([[0.0, 0.0, 0.0]] * 4, jnp.float32)
    u = jnp.asarray(np.random.default_rng(0).random((4, 2)), jnp.float32)
    ss = I.sample_rect(rows, p, u)
    # pdf equals d^2/(area*cos)
    cos = np.abs(np.asarray(ss["w"][:, 1]))
    expect = np.asarray(ss["distance"]) ** 2 / (1.0 * cos)
    assert np.allclose(np.asarray(ss["pdf"]), expect, rtol=1e-4)
