"""Dense-kernel group-AABB block cull (accel/pallas_traverse._make_dense_kernel):
an (8,128) ray block none of whose lanes can reach the group's bounds skips
the whole unrolled prim sweep via pl.when — verify the skipped path passes
best_t/best_e (and the any-hit flag) through bitwise, and that mixed ray sets
still match the XLA packet walk lane-for-lane (interpret mode on CPU)."""
from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture()
def sphere_accel():
    from pine_tpu.accel import packet as PK
    from pine_tpu.scene import shapes as S

    rng = np.random.default_rng(7)
    prims = []
    for i in range(12):  # dense group (<= DENSE_MAX=16), clustered near origin
        c = rng.uniform(-1, 1, 3).astype(np.float32)
        r = 0.2
        prims.append(
            (S.SPHERE, np.concatenate([c, [r]]).astype(np.float32), 0,
             (c - r, c + r))
        )
    accel = PK.build_packet_accel(prims, [])
    (g,) = accel["groups"]
    assert g["kind"] == "dense"
    return accel


def _mixed_rays():
    """First 1024 lanes (one whole block): origins far +x pointing away from
    the group — the block-cull slab must fail for every lane.  Second block:
    rays through the cluster."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 2048
    ro = np.zeros((n, 3), np.float32)
    rd = np.zeros((n, 3), np.float32)
    ro[:1024] = [50.0, 0.0, 0.0]
    rd[:1024] = [1.0, 0.0, 0.0]  # away from the cluster at the origin
    ro[1024:] = rng.uniform(-3, 3, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    rd[1024:] = d / np.linalg.norm(d, axis=1, keepdims=True)
    return (
        jnp.asarray(ro), jnp.asarray(rd),
        jnp.zeros(n, jnp.float32), jnp.full(n, 1e30, jnp.float32),
    )


def test_dense_cull_closest_matches_xla(sphere_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _mixed_rays()
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    t_ref, e_ref = PK.packet_intersect(sphere_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    monkeypatch.setenv("PINE_SMALL_KERNEL", "dense")
    t_new, e_new = PK.packet_intersect(sphere_accel, ro, rd, tmin, tmax)

    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    # the culled block must report clean misses
    assert (t_new[:1024] >= 1e30).all()
    np.testing.assert_allclose(t_new, t_ref, rtol=1e-5, atol=1e-6)
    hit = t_ref < 1e30
    assert (e_new[hit] == e_ref[hit]).all()


def test_dense_cull_positively_fires(sphere_accel, monkeypatch):
    """Distinguish the cull firing from the sweep running-and-missing:
    PINE_DENSE_PROBE=sweepmark makes a swept block overwrite its outputs with
    a marker (best_t=-123, occ=2), so a culled block is the one whose seeded
    sentinel passes through bitwise."""
    import jax.numpy as jnp
    from pine_tpu.accel.pallas_traverse import pallas_group_query

    (g,) = sphere_accel["groups"]
    ro, rd, tmin, tmax = _mixed_rays()
    n = ro.shape[0]
    monkeypatch.setenv("PINE_DENSE_PROBE", "sweepmark")

    # closest-hit: far block culls (sentinels pass through), near block sweeps
    bt = jnp.full(n, 777.0, jnp.float32)
    be = jnp.full(n, 55, jnp.int32)
    out_t, out_e = pallas_group_query(
        g, ro, rd, tmin, tmax, bt, be, any_hit=False, variant="dense"
    )
    out_t, out_e = np.asarray(out_t), np.asarray(out_e)
    assert (out_t[:1024] == 777.0).all() and (out_e[:1024] == 55).all()
    assert (out_t[1024:] == -123.0).all() and (out_e[1024:] == 2).all()

    # any-hit: a block aimed AT the cluster but with every lane already
    # occluded must cull too (per-lane empty slab window), while the same
    # block unoccluded sweeps
    ro2 = np.tile(np.array([[0.0, 0.0, -5.0]], np.float32), (2048, 1))
    rd2 = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (2048, 1))
    occ_in = np.zeros(2048, np.int32)
    occ_in[:1024] = 1  # first block fully occluded already
    _, occ_out = pallas_group_query(
        g, jnp.asarray(ro2), jnp.asarray(rd2),
        jnp.zeros(2048, jnp.float32), jnp.full(2048, 1e30, jnp.float32),
        jnp.full(2048, 1e30, jnp.float32), jnp.asarray(occ_in),
        any_hit=True, variant="dense",
    )
    occ_out = np.asarray(occ_out)
    assert (occ_out[:1024] == 1).all()  # culled: input passthrough, no marker
    assert (occ_out[1024:] == 2).all()  # swept: marker


def test_dense_cull_any_hit_matches_xla(sphere_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _mixed_rays()
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    occ_ref = PK.packet_any_hit(sphere_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    monkeypatch.setenv("PINE_SMALL_KERNEL", "dense")
    occ_new = PK.packet_any_hit(sphere_accel, ro, rd, tmin, tmax)

    occ_ref, occ_new = np.asarray(occ_ref), np.asarray(occ_new)
    assert not occ_new[:1024].any()
    assert (occ_new == occ_ref).all()
