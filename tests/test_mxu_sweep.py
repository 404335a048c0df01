"""MXU matmul sweep (accel/mxu_sweep.py) parity vs the dense Pallas kernel.

The matmul formulation computes each analytic test's dot products as
F @ W (o.n - p.n instead of (o-p).n), so values match the VPU kernels to
float tolerance, not bitwise.  Each supported type gets a randomized group;
closest-hit t/entity and any-hit occlusion must agree with the dense sweep
(interpret mode on CPU)."""
from __future__ import annotations

import numpy as np
import pytest

from pine_tpu.scene import shapes as S


def _group_for(tid, n=60, seed=3):
    """Random primitive group of one type, via the real accel builder."""
    from pine_tpu.accel import packet as PK

    rng = np.random.default_rng(seed + tid)
    prims = []
    for _ in range(n):
        p = rng.uniform(-2, 2, 3)
        if tid == S.SPHERE:
            shp = S.Sphere(p, rng.uniform(0.1, 0.6))
        elif tid == S.RECT:
            shp = S.Rect(p, rng.normal(size=3), rng.normal(size=3))
        elif tid == S.DISK:
            shp = S.Disk(p, rng.normal(size=3), rng.uniform(0.1, 0.8))
        elif tid == S.PLANE:
            shp = S.Plane(p, rng.normal(size=3))
        elif tid == S.TRIANGLE:
            shp = S.Triangle(p, p + rng.normal(size=3), p + rng.normal(size=3))
        elif tid == S.CONE:
            shp = S.Cone(p, rng.normal(size=3), rng.uniform(0.1, 0.5),
                         rng.uniform(0.2, 1.0))
        else:
            raise ValueError(tid)
        prims.append((tid, shp.params(), 0, shp.get_aabb()))
    accel = PK.build_packet_accel(prims, [])
    (g,) = accel["groups"]
    return g


def _rays(n=1024, seed=11):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return (
        jnp.asarray(ro), jnp.asarray(rd),
        jnp.full(n, 1e-3, jnp.float32), jnp.full(n, 1e30, jnp.float32),
    )


MXU_TIDS = [S.SPHERE, S.RECT, S.DISK, S.PLANE, S.TRIANGLE, S.CONE]


@pytest.mark.parametrize("variant", ["mxu", "mxup"])
@pytest.mark.parametrize("tid", MXU_TIDS)
def test_closest_hit_parity(tid, variant):
    import jax.numpy as jnp

    from pine_tpu.accel import pallas_traverse as PT

    g = _group_for(tid)
    ro, rd, tmin, tmax = _rays()
    n = ro.shape[0]
    bt0 = jnp.full(n, 1e30, jnp.float32)
    be0 = jnp.zeros(n, jnp.int32)

    t_ref, e_ref = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, be0, variant="dense"
    )
    t_new, e_new = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, be0, variant=variant
    )
    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    hit_ref, hit_new = t_ref < 1e29, t_new < 1e29
    assert hit_ref.sum() > 50, "scene must actually be hit"
    # identical hit classification except where t sits within fp noise of a
    # bound (plane groups hit everywhere, so disagreement means a real bug)
    agree = hit_ref == hit_new
    assert agree.mean() > 0.995, f"hit sets differ: {(~agree).sum()}/{n}"
    both = hit_ref & hit_new
    np.testing.assert_allclose(t_ref[both], t_new[both], rtol=3e-4, atol=3e-5)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    assert ((e_ref == e_new) | ~both).mean() > 0.99


@pytest.mark.parametrize("variant", ["mxu", "mxup"])
@pytest.mark.parametrize("tid", MXU_TIDS)
def test_any_hit_parity(tid, variant):
    import jax.numpy as jnp

    from pine_tpu.accel import pallas_traverse as PT

    g = _group_for(tid, seed=5)
    ro, rd, tmin, _ = _rays(seed=12)
    n = ro.shape[0]
    # finite segment limits so some rays are unoccluded
    rng = np.random.default_rng(13)
    tmax = jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    bt0 = jnp.full(n, 1e30, jnp.float32)
    occ0 = jnp.zeros(n, jnp.int32)

    _, occ_ref = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, occ0, any_hit=True, variant="dense"
    )
    _, occ_new = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, occ0, any_hit=True, variant=variant
    )
    occ_ref, occ_new = np.asarray(occ_ref), np.asarray(occ_new)
    assert 0 < occ_ref.sum() < n, "need a mix of occluded/clear"
    assert (occ_ref == occ_new).mean() > 0.995


def test_unsupported_type_falls_back():
    """Slab-tested types (AABB) have no matmul form; the mxu/mxup knobs must
    fall back to the dense kernel with identical results."""
    import jax.numpy as jnp

    from pine_tpu.accel import packet as PK
    from pine_tpu.accel import pallas_traverse as PT

    rng = np.random.default_rng(4)
    prims = []
    for _ in range(20):
        lo = rng.uniform(-2, 2, 3)
        shp = S.BoxAABB(lo, lo + rng.uniform(0.2, 1.0, 3))
        prims.append((S.BOX_AABB, shp.params(), 0, shp.get_aabb()))
    accel = PK.build_packet_accel(prims, [])
    (g,) = accel["groups"]
    ro, rd, tmin, tmax = _rays(n=256, seed=31)
    bt0 = jnp.full(256, 1e30, jnp.float32)
    be0 = jnp.zeros(256, jnp.int32)

    t_ref, _ = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, be0, variant="dense"
    )
    for v in ("mxu", "mxup"):
        t_new, _ = PT.pallas_group_query(
            g, ro, rd, tmin, tmax, bt0, be0, variant=v
        )
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_new))


def test_fused_dead_block_passthrough():
    """All-dead lanes (limit <= tmin, the renderer's -1 convention) must pass
    best_t/best_e through untouched — the fused kernel skips such blocks."""
    import jax.numpy as jnp

    from pine_tpu.accel import pallas_traverse as PT

    g = _group_for(S.SPHERE)
    ro, rd, tmin, _ = _rays(n=256)
    n = ro.shape[0]
    dead_tmax = jnp.full(n, -1.0, jnp.float32)
    bt0 = jnp.full(n, -1.0, jnp.float32)  # dead closest-hit convention
    be0 = jnp.arange(n, dtype=jnp.int32)

    t, e = PT.pallas_group_query(
        g, ro, rd, tmin, dead_tmax, bt0, be0, variant="mxup"
    )
    np.testing.assert_array_equal(np.asarray(t), np.asarray(bt0))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(be0))

    _, occ = PT.pallas_group_query(
        g, ro, rd, tmin, dead_tmax, bt0, be0, any_hit=True, variant="mxup"
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(be0))


def _mesh_group(n=9000, seed=7):
    """Triangle soup big enough for the HBM mesh path (> GRID_MAX_PRIMS)."""
    from pine_tpu.accel import packet as PK
    from pine_tpu.accel import pallas_traverse as PT

    rng = np.random.default_rng(seed)
    prims = []
    for _ in range(n):
        p = rng.uniform(-2, 2, 3)
        shp = S.Triangle(
            p, p + 0.4 * rng.normal(size=3), p + 0.4 * rng.normal(size=3)
        )
        prims.append((S.TRIANGLE, shp.params(), 0, shp.get_aabb()))
    accel = PK.build_packet_accel(prims, [])
    (g,) = accel["groups"]
    assert PT._grid_hbm(g), "test needs the HBM mesh path"
    return g


def test_mesh_mxu_closest_parity():
    """PINE_MESH_KERNEL=mxu grid kernel vs the VPU grid kernel (HBM scale)."""
    import jax.numpy as jnp

    from pine_tpu.accel import pallas_traverse as PT

    g = _mesh_group()
    ro, rd, tmin, tmax = _rays(n=1024, seed=21)
    n = ro.shape[0]
    bt0 = jnp.full(n, 1e30, jnp.float32)
    be0 = jnp.zeros(n, jnp.int32)

    t_ref, e_ref = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, be0, variant="grid"
    )
    t_new, e_new = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, be0, variant="mxu"
    )
    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    hit_ref, hit_new = t_ref < 1e29, t_new < 1e29
    assert hit_ref.sum() > 200, "scene must actually be hit"
    agree = hit_ref == hit_new
    assert agree.mean() > 0.995, f"hit sets differ: {(~agree).sum()}/{n}"
    both = hit_ref & hit_new
    np.testing.assert_allclose(t_ref[both], t_new[both], rtol=3e-4, atol=3e-5)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    assert ((e_ref == e_new) | ~both).mean() > 0.99


def test_mesh_mxu_any_hit_parity():
    import jax.numpy as jnp

    from pine_tpu.accel import pallas_traverse as PT

    g = _mesh_group(seed=9)
    ro, rd, tmin, _ = _rays(n=1024, seed=22)
    n = ro.shape[0]
    rng = np.random.default_rng(23)
    tmax = jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    bt0 = jnp.full(n, 1e30, jnp.float32)
    occ0 = jnp.zeros(n, jnp.int32)

    _, occ_ref = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, occ0, any_hit=True, variant="grid"
    )
    _, occ_new = PT.pallas_group_query(
        g, ro, rd, tmin, tmax, bt0, occ0, any_hit=True, variant="mxu"
    )
    occ_ref, occ_new = np.asarray(occ_ref), np.asarray(occ_new)
    assert 0 < occ_ref.sum() < n, "need a mix of occluded/clear"
    assert (occ_ref == occ_new).mean() > 0.995


def test_render_smoke_under_mxu(monkeypatch):
    """cbox-style mini render with PINE_SMALL_KERNEL=mxu matches dense."""
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")

    import jax.numpy as jnp  # noqa: F401

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.scene import materials as M
    from pine_tpu.scene.scene import Scene

    def build():
        sc = Scene()
        sc.add("white", M.Diffuse([0.8, 0.8, 0.8]))
        sc.add(S.Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "white")
        for x in (-0.5, 0.0, 0.5):
            for z in (0.6, 1.2):
                sc.add(S.Cone([x, 0, z], [0, 1, 0], 0.1, 0.3), "white")
        sc.add(S.Sphere([0.5, 0.3, 1.5], 0.3), "white")
        sc.add(
            S.Rect([0, 1.9, 1.0], [0.4, 0, 0], [0, 0, 0.4]),
            M.Emissive([40.0, 40.0, 40.0]),
        )
        sc.set(ThinLenCamera(Film([24, 24]), [0, 1, -3.0], [0, 0.5, 1], 0.3))
        return sc

    def render(kernel):
        monkeypatch.setenv("PINE_SMALL_KERNEL", kernel)
        sc = build()  # fresh scene per kernel: the render cache keys the knob
        img = render_wavefront(
            sc.compile(), sc.camera, 24, 24, BlueSampler(2), 2, 3
        )
        return np.asarray(img)

    a = render("dense")
    b = render("mxu")
    c = render("mxup")
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(a, c, rtol=1e-3, atol=2e-3)
