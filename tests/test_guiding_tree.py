"""Adaptive guiding structures (spatial octree + directional quadtrees):
device descent loops vs host oracles, sampler/pdf consistency, refinement
semantics (spatial_tree.h:30-355)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pine_tpu.integrators.guiding_tree import (  # noqa: E402
    GuidingTree,
    dtree_add,
    dtree_pdf,
    dtree_sample,
    stree_lookup,
)


def _lookup_args(gt):
    st = gt.device_state()
    return (
        st["schild"], st["sdroot"],
        jnp.asarray(gt.lo), jnp.asarray(gt.inv_diag),
        jnp.float32(gt.footprint0),
    )


def test_initial_tree_is_single_leaf_below_threshold():
    gt = GuidingTree([0, 0, 0], [1, 1, 1], n_initial_samples=1000, spatial_k=4000)
    assert gt.n_spatial_leaves() == 1


def test_initial_refinement_splits_spatially():
    # 640^2 pixels with k=4000 splits 3 octree levels -> 512 uniform leaves
    gt = GuidingTree([0, 0, 0], [1, 1, 1], n_initial_samples=640 * 640,
                     spatial_k=4000)
    assert gt.n_spatial_leaves() == 512


def test_stree_lookup_matches_host_oracle():
    rng = np.random.default_rng(7)
    gt = GuidingTree([-1, 0, -2], [3, 2, 1], n_initial_samples=300_000,
                     spatial_k=4000)
    # make it non-uniform: grow one region with fake sample counts
    st = gt.device_state()
    scount = np.zeros(st["scount"].shape[0], np.float32)
    hot = gt.host_lookup(np.asarray([2.9, 1.9, 0.9], np.float32))
    scount[hot] = 1e6
    gt.absorb(np.asarray(st["dcoll"]), scount)
    gt.refine(10_000.0)
    p = rng.uniform([-1, 0, -2], [3, 2, 1], size=(256, 3)).astype(np.float32)
    _, leaf_dev, foot = stree_lookup(*_lookup_args(gt), jnp.asarray(p))
    leaf_host = np.asarray([gt.host_lookup(q) for q in p])
    np.testing.assert_array_equal(np.asarray(leaf_dev), leaf_host)
    assert np.all(np.asarray(foot) > 0)


def _trained_tree(flux_quadrant=3, n_train=4000, seed=0):
    """One spatial leaf whose quadtree has been trained with flux concentrated
    in one root quadrant, then refined."""
    gt = GuidingTree([0, 0, 0], [1, 1, 1], n_initial_samples=16, spatial_k=4000)
    rng = np.random.default_rng(seed)
    st = gt.device_state()
    droot, _, _ = stree_lookup(
        *_lookup_args(gt), jnp.asarray([[0.5, 0.5, 0.5]], np.float32)
    )
    root = jnp.full((n_train,), int(droot[0]), jnp.int32)
    # 90% of flux in the chosen quadrant, 10% uniform elsewhere
    sq = rng.random((n_train, 2)).astype(np.float32)
    in_q = rng.random(n_train) < 0.9
    qx, qy = flux_quadrant & 1, (flux_quadrant >> 1) & 1
    sq[in_q, 0] = (sq[in_q, 0] * 0.5 + 0.5 * qx).astype(np.float32)
    sq[in_q, 1] = (sq[in_q, 1] * 0.5 + 0.5 * qy).astype(np.float32)
    dcoll = dtree_add(
        st["dcoll"], st["dchild"], root, jnp.asarray(sq),
        jnp.ones((n_train,), jnp.float32), jnp.ones((n_train,), bool),
    )
    scount = np.zeros(st["scount"].shape[0], np.float32)
    gt.absorb(np.asarray(dcoll), scount)
    gt.refine(1e12)  # no spatial split; quadtree refine + guide snapshot
    return gt


def test_dtree_sample_pdf_consistency():
    gt = _trained_tree()
    st = gt.device_state()
    droot, _, _ = stree_lookup(
        *_lookup_args(gt), jnp.asarray([[0.5, 0.5, 0.5]], np.float32)
    )
    n = 4096
    rng = np.random.default_rng(3)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    root = jnp.full((n,), int(droot[0]), jnp.int32)
    sq, pdf_s, valid = dtree_sample(st["dchild"], st["dflux"], root, u2)
    assert bool(jnp.all(valid))
    assert bool(jnp.all((sq >= 0) & (sq < 1)))
    pdf_e = np.asarray(dtree_pdf(st["dchild"], st["dflux"], root, sq))
    pdf_s = np.asarray(pdf_s)
    rel = np.abs(pdf_s - pdf_e) / np.maximum(pdf_e, 1e-6)
    # f32 leaf-square placement can round a sample across a bin edge: allow
    # isolated outliers, demand tight agreement everywhere else
    assert np.mean(rel > 1e-3) < 0.01, np.mean(rel > 1e-3)
    assert np.median(rel) < 1e-4


def test_dtree_sample_follows_flux():
    gt = _trained_tree(flux_quadrant=2)
    st = gt.device_state()
    droot, _, _ = stree_lookup(
        *_lookup_args(gt), jnp.asarray([[0.5, 0.5, 0.5]], np.float32)
    )
    n = 20000
    rng = np.random.default_rng(11)
    u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
    root = jnp.full((n,), int(droot[0]), jnp.int32)
    sq, _, _ = dtree_sample(st["dchild"], st["dflux"], root, u2)
    sq = np.asarray(sq)
    frac_hot = np.mean((sq[:, 0] < 0.5) & (sq[:, 1] >= 0.5))
    # trained 90/10 split (plus 3 untouched quadrants sharing the 10%)
    assert 0.85 < frac_hot < 0.97, frac_hot


def test_dtree_pdf_integrates_to_one():
    gt = _trained_tree(flux_quadrant=1)
    st = gt.device_state()
    droot, _, _ = stree_lookup(
        *_lookup_args(gt), jnp.asarray([[0.5, 0.5, 0.5]], np.float32)
    )
    n = 200_000
    rng = np.random.default_rng(5)
    sq = jnp.asarray(rng.random((n, 2)), jnp.float32)
    root = jnp.full((n,), int(droot[0]), jnp.int32)
    pdf = np.asarray(dtree_pdf(st["dchild"], st["dflux"], root, sq))
    assert abs(pdf.mean() - 1.0) < 0.02, pdf.mean()


def test_quadtree_refine_deepens_hot_region():
    gt = _trained_tree()
    # hot quadrant must have been subdivided deeper than the cold ones:
    # sample pdf in the hot region far exceeds the uniform 1.0
    st = gt.device_state()
    droot, _, _ = stree_lookup(
        *_lookup_args(gt), jnp.asarray([[0.5, 0.5, 0.5]], np.float32)
    )
    root = jnp.asarray([int(droot[0])] * 2, jnp.int32)
    sq = jnp.asarray([[0.75, 0.75], [0.1, 0.1]], jnp.float32)
    pdf = np.asarray(dtree_pdf(st["dchild"], st["dflux"], root, sq))
    assert pdf[0] > 2.5, pdf  # concentrated
    assert pdf[1] < 1.0, pdf  # depleted


def test_spatial_split_on_sample_count():
    gt = GuidingTree([0, 0, 0], [1, 1, 1], n_initial_samples=16, spatial_k=4000)
    assert gt.n_spatial_leaves() == 1
    st = gt.device_state()
    scount = np.zeros(st["scount"].shape[0], np.float32)
    scount[gt.host_lookup(np.asarray([0.5, 0.5, 0.5], np.float32))] = 50_000
    gt.absorb(np.asarray(st["dcoll"]), scount)
    gt.refine(10_000.0)
    assert gt.n_spatial_leaves() == 8
    # children inherited 1/8 of the parent count: a second refine at the same
    # threshold must NOT split further
    st = gt.device_state()
    gt.absorb(np.asarray(st["dcoll"]), np.zeros(st["scount"].shape[0], np.float32))
    gt.refine(10_000.0)
    assert gt.n_spatial_leaves() == 8


def test_collector_moving_average_halves():
    gt = _trained_tree()
    hot0 = max(q.flux for q in gt._qnodes)
    st = gt.device_state()
    gt.absorb(np.asarray(st["dcoll"]), np.zeros(st["scount"].shape[0], np.float32))
    gt.refine(1e12)
    hot1 = max(q.flux for q in gt._qnodes)
    assert abs(hot1 - hot0 / 2) < 1e-3 * hot0
