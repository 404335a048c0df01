"""Adaptive path-guiding structures: spatial octree of directional quadtrees
(parity: impl/integrator/spatial_tree.h:30-355, guidedpath.cpp:70-115).

The reference trains "Practical Path Guiding" (Mueller et al.) with an
adaptive binary/octree SpatialTree whose leaves each own an adaptive
directional QuadTree over the equal-area sphere->square map.  This module is
the TPU-native equivalent:

- Topology lives in flat int32 arenas (`s_child`, `d_child`: index of the
  first of 8/4 consecutive children, 0 = leaf) so a device lookup is a
  fixed-trip `lax.fori_loop` of gathers — no pointers, no recursion, static
  shapes, everything jit-traceable.
- Per-iteration flux accumulates on device by scatter-add along the quadtree
  descent path (spatial_tree.h add_sample adds at every node root->leaf).
- Between iterations the host reads the collector flux + per-leaf sample
  counts back ONCE (cheap in sync-dispatch mode), refines the trees in numpy
  (spatial leaf splits at n_samples > threshold, spatial_tree.h:249-275;
  quadtree subdivides nodes holding >1% of total flux up to depth 16,
  spatial_tree.h:133-150), snapshots the refined collector as the next
  iteration's frozen guide, and halves the collector (the reference's
  moving average, spatial_tree.h:124-131).

Capacities are padded to power-of-two buckets so refinement rarely changes
device array shapes (shape changes retrace the render program).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pine_tpu.core.vecmath import Pi

MAX_DDEPTH = 16  # quadtree depth cap (spatial_tree.h:134 `depth < 16`)
MAX_SDEPTH = 20  # octree descent trips (8^20 leaves is far past any split)
FLUX_SUBDIV = 0.01  # subdivide quadrants holding >1% of total flux
_EPS = 1e-12
_ONE_MINUS = 1.0 - 1e-6


# ---------------------------------------------------------------------------
# host-side tree (numpy): topology + refinement + arena export
# ---------------------------------------------------------------------------


class _QNode:
    __slots__ = ("flux", "children", "idx")

    def __init__(self, flux=0.0):
        self.flux = float(flux)
        self.children = None  # None | [_QNode x4]
        self.idx = 0  # arena index (assigned at export)


class _SNode:
    __slots__ = ("n_samples", "children", "collector", "guide", "idx")

    def __init__(self):
        self.n_samples = 0.0
        self.children = None  # None | [_SNode x8]
        self.collector = None  # _QNode root (leaves only)
        self.guide = None  # frozen _QNode snapshot (leaves only)
        self.idx = 0


def _qcopy(node):
    c = _QNode(node.flux)
    if node.children is not None:
        c.children = [_qcopy(k) for k in node.children]
    return c


def _qrefine(node, total, depth=0):
    """spatial_tree.h QuadNode::refine: subdivide heavy quadrants, collapse
    light ones."""
    if node.flux > total * FLUX_SUBDIV and depth < MAX_DDEPTH:
        if node.children is None:
            node.children = [_QNode(node.flux / 4) for _ in range(4)]
        for k in node.children:
            _qrefine(k, total, depth + 1)
    else:
        node.children = None


def _qhalve(node):
    node.flux /= 2
    if node.children is not None:
        for k in node.children:
            _qhalve(k)


class GuidingTree:
    """Host owner of the adaptive structures; device state is exported flat.

    Lifecycle per training iteration:
        gstate = tree.device_state()
        ... jit render iteration scatters into gstate['dcoll']/['scount'] ...
        tree.absorb(dcoll, scount)
        tree.refine(threshold)
    """

    def __init__(self, lo, hi, n_initial_samples, spatial_k=4000):
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        diag = np.maximum(hi - lo, 1e-6)
        self.lo = lo - 1e-4
        self.inv_diag = (1.0 / (diag + 2e-4)).astype(np.float32)
        self.tight_lo, self.tight_hi = lo, hi  # add_sample jitter clamp
        # root footprint = smallest AABB extent (spatial_tree.h:325)
        self.footprint0 = float(diag.min())
        self.spatial_k = int(spatial_k)
        self.root = _SNode()
        self.root.collector = _QNode(1.0)  # prepare_for_initial_refine
        self.root.n_samples = float(n_initial_samples)
        self._refine_node(self.root, float(spatial_k))
        self._export()

    # -- refinement ---------------------------------------------------------

    def _refine_node(self, node, threshold):
        if node.children is None:
            if node.n_samples > threshold:
                node.children = [_SNode() for _ in range(8)]
                for k in node.children:
                    k.collector = _qcopy(node.collector)
                    k.n_samples = node.n_samples / 8
                    self._refine_node(k, threshold)
                node.collector = node.guide = None
            else:
                total = max(node.collector.flux, _EPS)
                _qrefine(node.collector, total)
                node.guide = _qcopy(node.collector)
                _qhalve(node.collector)
        else:
            for k in node.children:
                self._refine_node(k, threshold)
        node.n_samples = 0.0

    def refine(self, threshold):
        self._refine_node(self.root, float(threshold))
        self._export()

    # -- device <-> host ----------------------------------------------------

    def absorb(self, dcoll, scount):
        """Write one iteration's device accumulation back into the host trees
        (dcoll: (T,) collector flux; scount: (S,) per-leaf sample counts)."""
        dcoll = np.asarray(dcoll)
        scount = np.asarray(scount)
        for q in self._qnodes:
            q.flux = float(dcoll[q.idx])
        for s in self._sleaves:
            s.n_samples += float(scount[s.idx])

    def device_state(self):
        """Flat arenas as a dict of jnp arrays (all jit ARGUMENTS — device
        constants captured in a traced program poison this TPU's dispatch)."""
        return {k: jnp.asarray(v) for k, v in self._arrays.items()}

    def _export(self):
        # children must be 8 consecutive arena slots: BFS by levels
        snodes = []
        queue = [self.root]
        while queue:
            nxt = []
            for n in queue:
                n.idx = len(snodes)
                snodes.append(n)
            for n in queue:
                if n.children is not None:
                    for k in n.children:
                        nxt.append(k)
            queue = nxt
        sleaves = [n for n in snodes if n.children is None]

        qnodes = [_QNode(0.0)]  # arena slot 0 reserved (0 == leaf sentinel)
        for leaf in sleaves:
            queue = [leaf.collector]
            while queue:
                nxt = []
                for q in queue:
                    q.idx = len(qnodes)
                    qnodes.append(q)
                for q in queue:
                    if q.children is not None:
                        nxt.extend(q.children)
                queue = nxt
        # guide snapshots share the collector topology: flux by parallel walk
        gflux = np.zeros(len(qnodes), np.float32)
        for leaf in sleaves:
            stack = [(leaf.collector, leaf.guide)]
            while stack:
                c, g = stack.pop()
                gflux[c.idx] = g.flux
                if c.children is not None:
                    stack.extend(zip(c.children, g.children))

        def cap(n, lo_cap=1024):
            c = lo_cap
            while c < n:
                c *= 2
            return c

        S, T = cap(len(snodes)), cap(len(qnodes))
        s_child = np.zeros(S, np.int32)
        s_droot = np.zeros(S, np.int32)
        cflux = np.zeros(T, np.float32)
        d_child = np.zeros(T, np.int32)
        for n in snodes:
            if n.children is not None:
                s_child[n.idx] = n.children[0].idx
            else:
                s_droot[n.idx] = n.collector.idx
        for q in qnodes:
            cflux[q.idx] = q.flux
            if q.children is not None:
                d_child[q.idx] = q.children[0].idx
        self._snodes, self._sleaves, self._qnodes = snodes, sleaves, qnodes[1:]
        self._arrays = dict(
            schild=s_child,
            sdroot=s_droot,
            dchild=d_child,
            dflux=_padto(gflux, T),
            dcoll=cflux,
            scount=np.zeros(S, np.float32),
        )

    # -- introspection (tests) ----------------------------------------------

    def n_spatial_leaves(self):
        return len(self._sleaves)

    def host_lookup(self, p):
        """Pure-host octree descent (test oracle for the device loop)."""
        rel = np.clip((np.asarray(p, np.float32) - self.lo) * self.inv_diag,
                      0.0, _ONE_MINUS)
        node = self.root
        while node.children is not None:
            oct_i = 0
            q = np.empty(3, np.float32)
            for a in range(3):
                if rel[a] < 0.5:
                    q[a] = rel[a] * 2
                else:
                    q[a] = (rel[a] - 0.5) * 2
                    oct_i += 1 << a
            node = node.children[oct_i]
            rel = q
        return node.idx


def _padto(a, n):
    out = np.zeros(n, a.dtype)
    out[: len(a)] = a
    return out


# ---------------------------------------------------------------------------
# device-side descent loops (pure jnp; all arrays are function arguments)
# ---------------------------------------------------------------------------


def stree_lookup(schild, sdroot, lo, inv_diag, footprint0, p):
    """Per-lane octree descent -> (dtree root index, leaf index, footprint).

    spatial_tree.h SpatialNode::traverse: each level halves the unit cube on
    all three axes (child index bit i set when p[i] >= 0.5)."""
    n = p.shape[0]
    rel = jnp.clip((p - lo) * inv_diag, 0.0, _ONE_MINUS)
    node = jnp.zeros((n,), jnp.int32)
    foot = jnp.full((n,), footprint0, jnp.float32)

    def body(_, st):
        node, rel, foot = st
        c0 = schild[node]
        leaf = c0 == 0
        hi = (rel >= 0.5).astype(jnp.int32)
        oct_i = hi[:, 0] + 2 * hi[:, 1] + 4 * hi[:, 2]
        node = jnp.where(leaf, node, c0 + oct_i)
        rel = jnp.where(leaf[:, None], rel, 2.0 * rel - hi.astype(jnp.float32))
        foot = jnp.where(leaf, foot, 0.5 * foot)
        return node, rel, foot

    node, rel, foot = jax.lax.fori_loop(0, MAX_SDEPTH, body, (node, rel, foot))
    return sdroot[node], node, foot


def dtree_sample(dchild, dflux, root, u2):
    """Hierarchical sample warp (spatial_tree.h QuadNode::sample): descend by
    child-flux conditionals, remapping u, then place uniformly in the leaf
    square.  Returns (square coords (n,2), pdf over the unit square, valid).
    The caller maps square->sphere (equal-area), dividing pdf by 4*pi."""
    n = root.shape[0]
    u0, u1 = u2[:, 0], u2[:, 1]
    px = jnp.zeros((n,), jnp.float32)
    py = jnp.zeros((n,), jnp.float32)
    length = jnp.ones((n,), jnp.float32)
    pdf = jnp.ones((n,), jnp.float32)
    done = jnp.zeros((n,), bool)
    invalid = jnp.zeros((n,), bool)

    def body(_, st):
        node, px, py, length, pdf, u0, u1, done, invalid = st
        c0 = dchild[node]
        leaf = c0 == 0
        f0, f1 = dflux[c0], dflux[c0 + 1]
        f2, f3 = dflux[c0 + 2], dflux[c0 + 3]
        ftot = f0 + f1 + f2 + f3
        step = ~done & ~leaf
        zero = ftot <= 0.0
        invalid = invalid | (step & zero)
        fl = f0 + f2  # left column (children 0,2: sc.x < 0.5)
        rx = fl / jnp.maximum(ftot, _EPS)
        gox = u0 >= rx
        px_prob = jnp.where(gox, 1.0 - rx, rx)
        u0n = jnp.clip(
            jnp.where(gox, (u0 - rx) / jnp.maximum(1.0 - rx, _EPS),
                      u0 / jnp.maximum(rx, _EPS)),
            0.0, _ONE_MINUS,
        )
        fy0 = jnp.where(gox, f1, f0)
        fyt = jnp.where(gox, ftot - fl, fl)
        ry = fy0 / jnp.maximum(fyt, _EPS)
        goy = u1 >= ry
        py_prob = jnp.where(goy, 1.0 - ry, ry)
        u1n = jnp.clip(
            jnp.where(goy, (u1 - ry) / jnp.maximum(1.0 - ry, _EPS),
                      u1 / jnp.maximum(ry, _EPS)),
            0.0, _ONE_MINUS,
        )
        quad = gox.astype(jnp.int32) + 2 * goy.astype(jnp.int32)
        adv = step & ~zero
        node = jnp.where(adv, c0 + quad, node)
        px = jnp.where(adv & gox, px + 0.5 * length, px)
        py = jnp.where(adv & goy, py + 0.5 * length, py)
        pdf = jnp.where(adv, pdf * 4.0 * px_prob * py_prob, pdf)
        length = jnp.where(adv, 0.5 * length, length)
        u0 = jnp.where(adv, u0n, u0)
        u1 = jnp.where(adv, u1n, u1)
        done = done | leaf | zero
        return node, px, py, length, pdf, u0, u1, done, invalid

    st = (root, px, py, length, pdf, u0, u1, done, invalid)
    node, px, py, length, pdf, u0, u1, done, invalid = jax.lax.fori_loop(
        0, MAX_DDEPTH, body, st
    )
    sq = jnp.stack([px + u0 * length, py + u1 * length], -1)
    return sq, jnp.where(invalid, 0.0, pdf), ~invalid


def dtree_pdf(dchild, dflux, root, sq):
    """pdf of the square coordinate under the tree distribution (QuadNode::pdf
    without the 1/(4*pi) sphere factor — the caller applies it)."""
    n = root.shape[0]
    pdf = jnp.ones((n,), jnp.float32)
    done = jnp.zeros((n,), bool)

    def body(_, st):
        node, sq, pdf, done = st
        c0 = dchild[node]
        leaf = c0 == 0
        hi_x = (sq[:, 0] >= 0.5).astype(jnp.int32)
        hi_y = (sq[:, 1] >= 0.5).astype(jnp.int32)
        quad = hi_x + 2 * hi_y
        f0, f1 = dflux[c0], dflux[c0 + 1]
        f2, f3 = dflux[c0 + 2], dflux[c0 + 3]
        ftot = f0 + f1 + f2 + f3
        fq = dflux[c0 + quad]
        step = ~done & ~leaf
        ratio = jnp.where(ftot > 0.0, 4.0 * fq / jnp.maximum(ftot, _EPS), 0.0)
        pdf = jnp.where(step, pdf * ratio, pdf)
        node = jnp.where(step, c0 + quad, node)
        off = jnp.stack([hi_x, hi_y], -1).astype(jnp.float32)
        sq = jnp.where(step[:, None], 2.0 * sq - off, sq)
        done = done | leaf
        return node, sq, pdf, done

    _, _, pdf, _ = jax.lax.fori_loop(0, MAX_DDEPTH, body, (root, sq, pdf, done))
    return pdf


def dtree_add(dcoll, dchild, root, sq, flux, mask):
    """Scatter `flux` into every node on the root->leaf path of sq (the
    unfiltered spatial_tree.h QuadNode::add_sample(sc, flux))."""
    val = jnp.where(mask, flux, 0.0)

    def body(_, st):
        dcoll, node, sq, active = st
        dcoll = dcoll.at[node].add(jnp.where(active, val, 0.0))
        c0 = dchild[node]
        leaf = c0 == 0
        hi_x = (sq[:, 0] >= 0.5).astype(jnp.int32)
        hi_y = (sq[:, 1] >= 0.5).astype(jnp.int32)
        quad = hi_x + 2 * hi_y
        step = active & ~leaf
        node = jnp.where(step, c0 + quad, node)
        off = jnp.stack([hi_x, hi_y], -1).astype(jnp.float32)
        sq = jnp.where(step[:, None], 2.0 * sq - off, sq)
        return dcoll, node, sq, step

    active = mask & (val != 0.0)
    dcoll, _, _, _ = jax.lax.fori_loop(
        0, MAX_DDEPTH + 1, body, (dcoll, root, sq, active)
    )
    return dcoll
