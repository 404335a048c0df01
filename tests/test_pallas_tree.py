"""Supercell-tree Pallas kernel (accel/pallas_traverse.py): interpret-mode
correctness vs the XLA packet walk on CPU.  The kernel itself runs compiled
only on TPU; interpret mode validates the traversal logic (tree descent,
cell culling, DMA staging, any-hit drain) lane-for-lane."""
from __future__ import annotations

import os

import numpy as np
import pytest


@pytest.fixture()
def tri_soup_accel(monkeypatch):
    from pine_tpu.accel import packet as PK
    from pine_tpu.accel import pallas_traverse as PT

    # force the HBM tree path for a small mesh (normally >8192 prims)
    monkeypatch.setattr(PT, "GRID_MAX_PRIMS", 64)

    rng = np.random.default_rng(0)
    n_tri = 700
    c = rng.uniform(-2, 2, (n_tri, 3)).astype(np.float32)
    tris = c[:, None, :] + rng.uniform(-0.25, 0.25, (n_tri, 3, 3)).astype(np.float32)

    class MeshObj:
        vertices = tris.reshape(-1, 3)
        indices = np.arange(3 * n_tri, dtype=np.uint32).reshape(-1, 3)
        normals = None
        texcoords = None

    accel = PK.build_packet_accel([], [(MeshObj, 0)])
    g = [g for g in accel["groups"] if g["kind"] != "dense"][0]
    assert PT._grid_eligible(g) and PT._grid_hbm(g)
    return accel


def _rays(n=2048, seed=1):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    ro = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return (
        jnp.asarray(ro), jnp.asarray(rd),
        jnp.zeros(n, jnp.float32), jnp.full(n, 1e30, jnp.float32),
    )


def test_sctree_closest_hit_matches_xla(tri_soup_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _rays()
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    t_ref, e_ref = PK.packet_intersect(tri_soup_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    t_new, e_new = PK.packet_intersect(tri_soup_accel, ro, rd, tmin, tmax)

    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    hit_ref, hit_new = t_ref < 1e29, t_new < 1e29
    assert (hit_ref == hit_new).all()
    assert hit_ref.sum() > 100  # the soup must actually be hit
    np.testing.assert_allclose(t_ref[hit_ref], t_new[hit_ref], rtol=2e-5, atol=1e-6)
    # entity ids agree wherever t is unique (ties may break differently)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    assert ((e_ref == e_new) | ~hit_ref).mean() > 0.99


@pytest.fixture()
def big_soup_accel(monkeypatch):
    """>16 supercells: exercises the coarse level + octant-ordered scan."""
    from pine_tpu.accel import packet as PK
    from pine_tpu.accel import pallas_traverse as PT

    monkeypatch.setattr(PT, "GRID_MAX_PRIMS", 64)
    rng = np.random.default_rng(7)
    n_tri = 3000
    c = rng.uniform(-2, 2, (n_tri, 3)).astype(np.float32)
    tris = c[:, None, :] + rng.uniform(-0.2, 0.2, (n_tri, 3, 3)).astype(np.float32)

    class MeshObj:
        vertices = tris.reshape(-1, 3)
        indices = np.arange(3 * n_tri, dtype=np.uint32).reshape(-1, 3)
        normals = None
        texcoords = None

    accel = PK.build_packet_accel([], [(MeshObj, 0)])
    g = [g for g in accel["groups"] if g["kind"] != "dense"][0]
    assert PT._grid_eligible(g) and PT._grid_hbm(g)
    assert PT._grid_layout(g)["e_pad"] // PT.SUPER > 16
    return accel


def test_octorder_grid_matches_xla(big_soup_accel, monkeypatch):
    """Near-first octant-ordered grid scan is a pure visit reordering:
    closest hits must match the XLA walk lane-for-lane."""
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _rays(n=1024, seed=3)
    monkeypatch.setenv("PINE_MESH_KERNEL", "grid")
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    t_ref, e_ref = PK.packet_intersect(big_soup_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    t_new, e_new = PK.packet_intersect(big_soup_accel, ro, rd, tmin, tmax)

    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    hit_ref, hit_new = t_ref < 1e29, t_new < 1e29
    assert (hit_ref == hit_new).all()
    assert hit_ref.sum() > 100
    np.testing.assert_allclose(t_ref[hit_ref], t_new[hit_ref], rtol=2e-5, atol=1e-6)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    assert ((e_ref == e_new) | ~hit_ref).mean() > 0.99
    # occlusion parity on the same soup (any-hit drain + ordering)
    import jax.numpy as jnp

    tmax2 = jnp.full(ro.shape[0], 2.5, jnp.float32)
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    occ_ref = np.asarray(PK.packet_any_hit(big_soup_accel, ro, rd, tmin, tmax2))
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    occ_new = np.asarray(PK.packet_any_hit(big_soup_accel, ro, rd, tmin, tmax2))
    assert occ_ref.sum() > 50
    assert (occ_ref == occ_new).all()


def test_sctree_any_hit_matches_xla(tri_soup_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, _ = _rays(seed=2)
    import jax.numpy as jnp

    tmax = jnp.full(ro.shape[0], 2.0, jnp.float32)
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    occ_ref = np.asarray(PK.packet_any_hit(tri_soup_accel, ro, rd, tmin, tmax))
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    occ_new = np.asarray(PK.packet_any_hit(tri_soup_accel, ro, rd, tmin, tmax))
    assert occ_ref.sum() > 50
    assert (occ_ref == occ_new).all()
