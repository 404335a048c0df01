import jax.numpy as jnp
import numpy as np
import pytest

from pine_tpu.core import color, sampling, scattering as sc, vecmath as vm
from pine_tpu.core.ray import offset_ray_origin


def test_normalize_and_dot():
    v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = vm.normalize(v)
    assert np.allclose(vm.length(n), 1.0, atol=1e-6)
    assert np.allclose(vm.dot(n, n), 1.0, atol=1e-6)


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(0)
    n = vm.normalize(jnp.asarray(rng.normal(size=(100, 3)), jnp.float32))
    t, b = vm.coordinate_system(n)
    assert np.allclose(vm.dot(t, n), 0.0, atol=1e-5)
    assert np.allclose(vm.dot(b, n), 0.0, atol=1e-5)
    assert np.allclose(vm.dot(t, b), 0.0, atol=1e-5)
    assert np.allclose(vm.length(t), 1.0, atol=1e-5)


def test_to_local_world_roundtrip():
    rng = np.random.default_rng(1)
    n = vm.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
    w = vm.normalize(jnp.asarray(rng.normal(size=(50, 3)), jnp.float32))
    wl = vm.to_local(n, w)
    w2 = vm.to_world(n, wl)
    assert np.allclose(np.asarray(w), np.asarray(w2), atol=1e-5)
    # local z == dot(w, n)
    assert np.allclose(np.asarray(wl[..., 2]), np.asarray(vm.dot(w, n)), atol=1e-5)


def test_look_at_matches_reference_convention():
    m = vm.look_at([0, 1, -4], [0, 1, 0])
    # forward (z column) points from camera to target
    assert np.allclose(m[:3, 2], [0, 0, 1], atol=1e-6)
    assert np.allclose(m[:3, 3], [0, 1, -4])


def test_transform_builders():
    p = jnp.asarray([1.0, 0.0, 0.0])
    m = vm.rotate_y(np.pi / 2)
    out = vm.apply_mat4(m, p)
    assert np.allclose(np.asarray(out), [0, 0, -1], atol=1e-6)
    m2 = vm.translate([1, 2, 3]) @ vm.scale([2, 2, 2])
    out2 = vm.apply_mat4(m2, p)
    assert np.allclose(np.asarray(out2), [3, 2, 3], atol=1e-6)


def test_sampling_hemisphere_distribution():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((20000, 2)), jnp.float32)
    d = sampling.cosine_weighted_hemisphere(u)
    assert np.all(np.asarray(d[..., 2]) >= 0)
    assert np.allclose(vm.length(d), 1.0, atol=1e-4)
    # E[cos theta] = 2/3 for cosine-weighted
    assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


def test_uniform_sphere_mean_zero():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.random((20000, 2)), jnp.float32)
    d = sampling.uniform_sphere(u)
    assert np.allclose(np.asarray(jnp.mean(d, 0)), 0.0, atol=0.02)


def test_fr_dielectric_range_and_tir():
    cos_i = jnp.asarray([1.0, 0.5, 0.1, -0.5])
    fr = sc.fr_dielectric(cos_i, 1.5)
    assert np.all(np.asarray(fr) >= 0) and np.all(np.asarray(fr) <= 1)
    # grazing from dense side beyond critical angle -> TIR
    fr_tir = sc.fr_dielectric(jnp.asarray([-0.1]), 1.5)
    assert np.allclose(np.asarray(fr_tir), 1.0)


def test_refract_snell():
    wi = vm.normalize(jnp.asarray([[0.5, 0.0, 0.8]]))
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    ok, wt, etap = sc.refract(wi, n, 1.5)
    assert bool(ok[0])
    sin_i = np.sqrt(1 - float(wi[0, 2]) ** 2)
    sin_t = np.sqrt(float(wt[0, 0]) ** 2 + float(wt[0, 1]) ** 2)
    assert abs(sin_i / sin_t - 1.5) < 1e-3


def test_ggx_sample_pdf_consistency():
    rng = np.random.default_rng(4)
    alpha = jnp.full((5000,), 0.25, jnp.float32)
    wi = vm.normalize(jnp.asarray([[0.3, 0.1, 0.9]] * 5000, jnp.float32))
    u = jnp.asarray(rng.random((5000, 2)), jnp.float32)
    wm = sc.ggx_sample_wm(alpha, wi, u)
    assert np.allclose(vm.length(wm), 1.0, atol=1e-4)
    assert np.all(np.asarray(wm[..., 2]) > 0)
    # pdf should be positive for sampled normals
    pdf = sc.ggx_pdf(alpha, wi, wm)
    assert np.all(np.asarray(pdf) > 0)


def test_tonemappers():
    x = jnp.asarray([[0.0, 0.5, 100.0]])
    u2 = color.uncharted2_filmic(x)
    a = color.aces(x)
    assert float(u2[0, 0]) == pytest.approx(0.0, abs=1e-5)
    assert np.all(np.asarray(a) <= 1.0)
    assert float(u2[0, 2]) > 0.9


def test_offset_ray_origin_moves_forward():
    p = jnp.asarray([[1.0, -2.0, 0.001]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    o = offset_ray_origin(p, n)
    assert float(o[0, 1]) > float(p[0, 1])
    assert float(o[0, 0]) == pytest.approx(1.0, abs=1e-4)


def test_balance_heuristic():
    assert float(sampling.balance_heuristic(jnp.float32(1.0), jnp.float32(3.0))) == pytest.approx(
        0.25
    )
