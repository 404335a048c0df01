"""Lattice-kernel gates: regular prim fields (script loops) traverse via
arithmetic reconstruction (accel/pallas_traverse._make_lattice_kernel)
instead of a dense sweep.  Parity must be exact against the dense kernel:
build_packet_accel SNAPS detected groups to the affine model so every
traversal path sees identical geometry.

Reference posture: the reference hands fields like the README cbox's cone
floor to Embree's BVH (impl/accel/embree.cpp); the lattice kernel is the
TPU replacement for that hot path.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pine_tpu.accel import packet as PK
from pine_tpu.accel import pallas_traverse as PT
from pine_tpu.scene import shapes as S


def _cone_field(ni, nj, jitter=0.0, seed=0):
    """analytic_prims for an ni x nj cone lattice like the README cbox."""
    rng = np.random.default_rng(seed)
    prims = []
    for i in range(ni):
        for j in range(nj):
            x = -1.0 + 0.1 * i + (rng.uniform(-jitter, jitter) if jitter else 0.0)
            z = 0.0 + 0.1 * j
            apex = np.array([x, 0.05, z], np.float32)
            # cone params as shapes.py Cone builds them
            from pine_tpu.scene.shapes import Cone

            c = Cone(apex - [0, 0.05, 0], [0, 1, 0], 0.05, 0.05)
            lo, hi = c.get_aabb()
            prims.append((S.CONE, c.params(), 0, (np.asarray(lo), np.asarray(hi))))
    return prims


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform([-2, 0.2, -2], [2, 2.5, 3], (n, 3)).astype(np.float32)
    tgt = rng.uniform([-1.2, 0.0, -0.2], [1.2, 0.06, 2.2], (n, 3)).astype(
        np.float32
    )
    rd = tgt - ro
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    # grazing rays along the floor plane stress the segment march
    ro[::7, 1] = 0.02
    g = rng.normal(size=(len(ro[::7]), 3)).astype(np.float32)
    g[:, 1] *= 0.05
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    rd[::7] = g
    return jnp.asarray(ro), jnp.asarray(rd)


def test_detect_lattice_cone_field():
    prims = _cone_field(6, 5)
    acc = PK.build_packet_accel(prims, [])
    g = acc["groups"][0]
    lat = g.get("lattice")
    assert lat is not None
    assert (lat["ni"], lat["nj"]) == (6, 5)
    # default policy: small fields keep the dense sweep (cbox A/B tie);
    # above the dense cutoff the lattice kernel is the default
    assert PT._group_variant(g) == "dense"
    os.environ["PINE_SMALL_KERNEL"] = "lattice"
    try:
        assert PT._group_variant(g) == "lattice"
    finally:
        del os.environ["PINE_SMALL_KERNEL"]
    # k -> SAH slot translation is a true inverse of the build order
    rows = g["rows_np"][: 6 * 5]
    k = 7  # i=1, j=2
    slot = lat["slot_of_k"][k]
    want = lat["base"] + 1 * lat["dU"] + 2 * lat["dV"]
    np.testing.assert_allclose(rows[slot], want, rtol=0, atol=1e-6)


def test_large_lattice_defaults_to_lattice_kernel():
    prims = _cone_field(24, 24)  # 576 > DENSE_DEFAULT_MAX
    acc = PK.build_packet_accel(prims, [])
    g = acc["groups"][0]
    assert g.get("lattice") is not None
    assert PT._group_variant(g) == "lattice"


def test_detect_lattice_rejects_jitter():
    prims = _cone_field(6, 5, jitter=0.02)
    acc = PK.build_packet_accel(prims, [])
    assert acc["groups"][0].get("lattice") is None


def test_detect_lattice_1d():
    prims = _cone_field(1, 24)  # > DENSE_MAX so detection runs
    acc = PK.build_packet_accel(prims, [])
    lat = acc["groups"][0].get("lattice")
    assert lat is not None and lat["ni"] == 1 and lat["nj"] == 24


@pytest.mark.parametrize("any_hit", [False, True])
def test_lattice_parity_vs_dense(any_hit):
    prims = _cone_field(6, 5)
    acc = PK.build_packet_accel(prims, [])
    g = acc["groups"][0]
    assert g.get("lattice") is not None
    n = 512
    ro, rd = _rays(n)
    tmin = jnp.full((n,), 1e-4)
    if any_hit:
        tmax = jnp.full((n,), 3.0)
        occ0 = jnp.zeros((n,), jnp.int32)
        _, o_d = PT.pallas_group_query(
            g, ro, rd, tmin, tmax, tmax, occ0, any_hit=True, variant="dense"
        )
        _, o_l = PT.pallas_group_query(
            g, ro, rd, tmin, tmax, tmax, occ0, any_hit=True, variant="lattice"
        )
        o_d, o_l = np.asarray(o_d), np.asarray(o_l)
        assert o_d.sum() > 10  # scene sanity: rays do hit
        np.testing.assert_array_equal(o_d, o_l)
    else:
        tmax = jnp.full((n,), 1e30)
        be = jnp.full((n,), -1, jnp.int32)
        t_d, e_d = PT.pallas_group_query(
            g, ro, rd, tmin, tmax, tmax, be, any_hit=False, variant="dense"
        )
        t_l, e_l = PT.pallas_group_query(
            g, ro, rd, tmin, tmax, tmax, be, any_hit=False, variant="lattice"
        )
        t_d, e_d, t_l, e_l = map(np.asarray, (t_d, e_d, t_l, e_l))
        hit_d = t_d < 1e30
        hit_l = t_l < 1e30
        assert hit_d.sum() > 15  # scene sanity
        np.testing.assert_array_equal(hit_d, hit_l)
        np.testing.assert_array_equal(t_d[hit_d], t_l[hit_d])
        np.testing.assert_array_equal(e_d[hit_d], e_l[hit_d])


def test_lattice_parity_vs_xla_walk(monkeypatch):
    """The XLA packet walk (pallas off) sees the same snapped geometry."""
    prims = _cone_field(6, 5)
    acc = PK.build_packet_accel(prims, [])
    n = 512
    ro, rd = _rays(n, seed=3)
    tmin = jnp.full((n,), 1e-4)
    tmax = jnp.full((n,), 1e30)
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    t_x, e_x = PK.packet_intersect(acc, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    t_p, e_p = PK.packet_intersect(acc, ro, rd, tmin, tmax)
    t_x, e_x, t_p, e_p = map(np.asarray, (t_x, e_x, t_p, e_p))
    hit = t_x < 1e30
    assert hit.sum() > 15
    np.testing.assert_array_equal(hit, t_p < 1e30)
    # the XLA walk evaluates scene/intersect.py's formulation, not the
    # kernel's scalarized one: same snapped geometry, different FP
    # association — tolerance matches test_pallas_tree's cross-path gates
    np.testing.assert_allclose(t_x[hit], t_p[hit], rtol=2e-5, atol=1e-6)
    same_e = e_x[hit] == e_p[hit]
    assert same_e.mean() > 0.95  # near-tie boundaries may pick either prim
