"""Scene: host-side container + compilation into SoA device tables.

Parity: src/pine/core/scene.h/.cpp — ``add`` of shapes/materials/lights,
emissive geometry auto-registers an AreaLight (scene.cpp:14-21).

``Scene.compile()`` flattens every analytic shape into its type's dense
parameter table and builds per-global-shape index maps; the renderer's
intersection is then one dense kernel per shape *type* (no per-ray variant
dispatch — SURVEY.md design translation table).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pine_tpu.scene import intersect as I
from pine_tpu.scene import lights as L
from pine_tpu.scene import materials as M
from pine_tpu.scene import nodes as N
from pine_tpu.scene import shapes as S

BIG = I.BIG

# Instancings whose realized size stays under this many triangle rows are
# flattened into the unified BVH (the small-count fast path); above it they
# keep O(mesh) memory via lazy two-level traversal (geometry.h:371-390,
# Embree RTC instancing).
FLATTEN_LIMIT = 200_000


def _spread10(x):
    """Interleave-ready bit spread: 10 low bits -> every 3rd bit."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def _ray_sort_perm(ro, rd, tmin, tmax, world_lo, world_span, mode="octant"):
    """Wavefront coherence sort: (dead, direction octant, origin morton).

    The Pallas traversal kernels cull at (8,128)-ray-block granularity; a
    block of incoherent bounce rays overlaps every supercell and the culls
    do nothing (honest-timing lab: terrain incoherent = a full dense scan).
    Sorting lanes so a block shares an origin cell + direction octant makes
    the block footprint small again, and packing dead lanes (tmax<=tmin)
    last turns them into all-dead blocks the kernels skip outright — block-
    level stream compaction without moving any per-lane payload twice.

    mode="origin": origin-major key (dead, fine 128³ origin morton, octant).
    Bounce rays originate ON an instance's surface, so a fine origin cell IS
    an instance bin — blocks share a compact set of instance entries in the
    two-level kernel's per-block top-level walk (the r5 count probe measured
    15.6 instance entries × 9.2 supercell bodies per unsorted bounce block;
    octant-major sorting recovers only ~18% because it splits lanes that
    share a rock across direction bins).

    Pure permutation: per-lane results are bitwise identical, only kernel
    work changes.  Returns (perm, inv_perm)."""
    n = ro.shape[0]
    if mode == "origin":
        q = jnp.clip(
            ((ro - world_lo) * (128.0 / world_span)).astype(jnp.int32), 0, 127
        )
        m = (
            _spread10(q[:, 0])
            | (_spread10(q[:, 1]) << 1)
            | (_spread10(q[:, 2]) << 2)
        )  # 21 bits
        dbin = (
            (rd[:, 0] < 0).astype(jnp.int32)
            + 2 * (rd[:, 1] < 0).astype(jnp.int32)
            + 4 * (rd[:, 2] < 0).astype(jnp.int32)
        )
        dead = (tmax <= tmin).astype(jnp.int32)
        key = dbin | (m << 3) | (dead << 24)
        perm = jnp.argsort(key)
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        return perm, inv
    q = jnp.clip(
        ((ro - world_lo) * (32.0 / world_span)).astype(jnp.int32), 0, 31
    )
    m = (
        _spread10(q[:, 0])
        | (_spread10(q[:, 1]) << 1)
        | (_spread10(q[:, 2]) << 2)
    )
    import os

    dirbits = int(os.environ.get("PINE_SORT_DIRBITS", "3"))
    if dirbits <= 3:
        dbin = (
            (rd[:, 0] < 0).astype(jnp.int32)
            + 2 * (rd[:, 1] < 0).astype(jnp.int32)
            + 4 * (rd[:, 2] < 0).astype(jnp.int32)
        )
        dirbits = 3
    else:
        # octahedral direction bins (dirbits/2 bits per axis): finer than
        # the 8 octants, so a block's direction cone — and with it the
        # union footprint its slab culls see — shrinks
        # k capped at 7: the key packs 15 morton + 2k direction + 1 dead bit
        # into int32, so 15 + 2k + 1 must stay below the sign bit
        k = min(dirbits // 2, 7)
        s = jnp.abs(rd).sum(axis=1)
        px, py = rd[:, 0] / s, rd[:, 1] / s
        neg = rd[:, 2] < 0
        fx = jnp.where(neg, (1 - jnp.abs(py)) * jnp.sign(px), px)
        fy = jnp.where(neg, (1 - jnp.abs(px)) * jnp.sign(py), py)
        hi = (1 << k) - 1
        qx = jnp.clip(((fx + 1) * 0.5 * (hi + 1)).astype(jnp.int32), 0, hi)
        qy = jnp.clip(((fy + 1) * 0.5 * (hi + 1)).astype(jnp.int32), 0, hi)
        dbin = qx | (qy << k)
        dirbits = 2 * k
    dead = (tmax <= tmin).astype(jnp.int32)
    key = m | (dbin << 15) | (dead << (15 + dirbits))
    perm = jnp.argsort(key)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return perm, inv


def _sort_rays_enabled(n, heavy):
    """Coherence sort gate: pallas kernels in use and a real wavefront.

    auto = heavy-traversal scenes only.  Honest A/B on the real chip
    (scripts_render_ab.py, STATUS r4): the argsort costs ~2ms per query at
    64k lanes; on the 99k-tri terrain it buys 2.2-2.3x render wall (34.5s
    -> 14.1s), on the small cbox it costs more than the culls save (3.6s ->
    5.6s).  PINE_SORT_RAYS=1/0 forces either way."""
    import os

    flag = os.environ.get("PINE_SORT_RAYS", "auto")
    if flag == "0":
        return False
    from pine_tpu.accel.packet import _use_pallas

    if not _use_pallas():
        return False
    if n < 4096:
        return False
    return heavy or flag == "1"


class Scene:
    def __init__(self):
        self.materials = {}  # name -> Material
        self.geometries = []  # (shape, material)
        self.instancings = []  # InstancedShape kept lazy (two-level accel)
        self.lights = []
        self.mediums = []
        self.env_light = None
        self.camera = None
        self._compiled = None

    # ---- PRL-visible API ---------------------------------------------------
    def add_material(self, name, material):
        self.materials[name] = material
        self._compiled = None
        return material

    def add_geometry(self, shape, material):
        if isinstance(material, str):
            if material not in self.materials:
                raise RuntimeError(f"Can't find material `{material}`")
            material = self.materials[material]
        from pine_tpu.scene.csg import CSGShape

        if isinstance(shape, CSGShape):
            # CSG shapes flatten at compile time; store as-is.
            pass
        self.geometries.append((shape, material))
        self._compiled = None
        return material

    def add(self, *args):
        """Overload dispatch mirroring scene_context (scene.cpp:64-81)."""
        if len(args) == 2 and isinstance(args[0], str):
            return self.add_material(args[0], args[1])
        if len(args) == 2:
            return self.add_geometry(args[0], args[1])
        (x,) = args
        if isinstance(x, S.InstancedShape):
            n_rows = (
                len(x.instances) * x.shape.num_triangles()
                if isinstance(x.shape, S.Mesh) else 0
            )
            emissive = any(mat.is_emissive() for _, mat in x.instances)
            if (
                not isinstance(x.shape, S.Mesh)
                or emissive  # area-light sampling needs realized geometry
                or n_rows <= FLATTEN_LIMIT
            ):
                # small counts realize at compile time (scene.cpp
                # add(Instancing)) — the flattened fast path
                for m, mat in x.instances:
                    self.add_geometry(x.shape.transformed(m), mat)
            else:
                # lazy two-level: O(mesh) memory regardless of instance count
                self.instancings.append(x)
                self._compiled = None
            return x
        if isinstance(x, L.Light):
            self.lights.append(x)
            self._compiled = None
            return x
        from pine_tpu.scene.media import GridMedium, HomogeneousMedium

        if isinstance(x, (HomogeneousMedium, GridMedium)):
            self.mediums.append(x)
            self._compiled = None
            return x
        raise TypeError(f"Scene.add: unsupported argument {x!r}")

    def set(self, x):
        from pine_tpu.core.camera import ThinLenCamera

        if isinstance(x, ThinLenCamera):
            self.camera = x
        elif isinstance(x, L.EnvironmentLight):
            self.env_light = x
            self._compiled = None
        else:
            raise TypeError(f"Scene.set: unsupported argument {x!r}")
        return x

    def get_aabb(self):
        lo = np.full(3, np.inf, np.float32)
        up = np.full(3, -np.inf, np.float32)
        for shape, _ in self.geometries:
            a, b = shape.get_aabb()
            lo = np.minimum(lo, a)
            up = np.maximum(up, b)
        for inst in self.instancings:
            a, b = inst.shape.get_aabb()
            corners = np.array(
                [[x, y, z] for x in (a[0], b[0]) for y in (a[1], b[1])
                 for z in (a[2], b[2])], np.float32,
            )
            for m, _ in inst.instances:
                wc = corners @ m[:3, :3].T + m[:3, 3]
                lo = np.minimum(lo, wc.min(0))
                up = np.maximum(up, wc.max(0))
        return lo, up

    def compile(self):
        if self._compiled is None:
            self._compiled = CompiledScene(self)
        return self._compiled

    def content_key(self):
        """Content hash over all host-side scene data.  Renders of scenes
        with identical content share jit programs (multi-frame scripts like
        pine.pine would otherwise recompile every frame)."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)

        def add(x):
            if x is None:
                h.update(b"\0")
            elif isinstance(x, (int, float, bool, str)):
                h.update(repr(x).encode())
            elif isinstance(x, np.ndarray):
                h.update(x.tobytes())
            else:
                h.update(type(x).__name__.encode())
                d = getattr(x, "__dict__", None)
                if d is not None:
                    for k in sorted(d):
                        if k.startswith("_"):
                            continue
                        h.update(k.encode())
                        v = d[k]
                        # device arrays hash by shape only (their content
                        # derives from host fields already hashed; reading
                        # them back would poison TPU dispatch)
                        if hasattr(v, "devices"):
                            h.update(repr((v.shape, str(v.dtype))).encode())
                        else:
                            add(v)

        for shape, mat in self.geometries:
            add(shape)
            add(mat)
        for inst in self.instancings:
            add(inst.shape)
            for m, mat in inst.instances:
                add(m)
                add(mat)
        for li in self.lights:
            add(li)
        for m in self.mediums:
            add(m)
        add(self.env_light)
        return h.hexdigest()


class CompiledScene:
    """SoA device tables + static dispatch metadata for one Scene."""

    def __init__(self, scene: Scene):
        self.scene = scene
        mat_slots = []  # unique material objects in slot order
        mat_of = {}

        def mat_slot(m):
            key = id(m)
            if key not in mat_of:
                mat_of[key] = len(mat_slots)
                mat_slots.append(m)
            return mat_of[key]

        per_type = {}  # type_id -> list of param rows
        type_global = {}  # type_id -> list of global idx
        g_type, g_local, g_mat = [], [], []
        self.sdf_shapes = []  # (SDFShape, global_idx)
        self.meshes = []  # (Mesh, global_idx)
        area_lights = []

        analytic_entities = []

        def add_flat(shape, mslot):
            gidx = len(g_type)
            if isinstance(shape, S.SDFShape):
                g_type.append(S.SDF_TYPE)
                g_local.append(len(self.sdf_shapes))
                self.sdf_shapes.append((shape, gidx))
            elif isinstance(shape, S.Mesh):
                g_type.append(S.MESH_TYPE)
                g_local.append(len(self.meshes))
                self.meshes.append((shape, gidx))
            else:
                tid = shape.type_id
                rows = per_type.setdefault(tid, [])
                type_global.setdefault(tid, []).append(gidx)
                g_type.append(tid)
                g_local.append(len(rows))
                rows.append(shape.params())
                analytic_entities.append((tid, shape.params(), gidx, shape.get_aabb()))
            g_mat.append(mslot)
            return gidx

        from pine_tpu.scene.csg import CSGShape

        self.csg_shapes = []
        for shape, mat in scene.geometries:
            mslot = mat_slot(mat)
            if isinstance(shape, CSGShape):
                gidx = len(g_type)
                g_type.append(-1)
                g_local.append(len(self.csg_shapes))
                g_mat.append(mslot)
                self.csg_shapes.append((shape, gidx))
                continue
            gidx = add_flat(shape, mslot)
            if mat.is_emissive():
                area_lights.append(L.AreaLight(shape, mat, gidx))

        # lazy instancings: one global entry PER INSTANCE (materials differ),
        # but geometry memory stays O(mesh) — the accel stores the mesh once
        inst_records = []
        for inst in scene.instancings:
            gidx_list = []
            minv_list, m_list = [], []
            for m, mat in inst.instances:
                m = np.asarray(m, np.float32)
                gidx = len(g_type)
                g_type.append(S.MESH_TYPE)
                g_local.append(0)
                g_mat.append(mat_slot(mat))
                gidx_list.append(gidx)
                m_list.append(m[:3, :4].reshape(12))
                mi = np.linalg.inv(m).astype(np.float32)
                minv_list.append(mi[:3, :4].reshape(12))
            inst_records.append(
                dict(
                    mesh=inst.shape,
                    m=np.stack(m_list),
                    minv=np.stack(minv_list),
                    gidx=np.asarray(gidx_list, np.int32),
                )
            )
        self.inst_records = inst_records

        self.materials = mat_slots
        self.n_global = len(g_type)
        self.g_type = np.asarray(g_type, np.int32)
        self.g_local = np.asarray(g_local, np.int32)
        self.g_mat = np.asarray(g_mat, np.int32)
        self.tables = {
            tid: jnp.asarray(np.stack(rows)) for tid, rows in per_type.items()
        }
        self.type_global = {
            tid: jnp.asarray(np.asarray(v, np.int32)) for tid, v in type_global.items()
        }
        self.g_type_dev = jnp.asarray(self.g_type)
        self.g_local_dev = jnp.asarray(self.g_local)
        self.g_mat_dev = jnp.asarray(self.g_mat)

        # participating media: homogeneous (analytic transmittance) vs grid
        # (delta/ratio tracking, medium.cpp:90-290)
        from pine_tpu.scene.media import GridMedium

        self.media = [m for m in scene.mediums if not isinstance(m, GridMedium)]
        self.grid_media = [m for m in scene.mediums if isinstance(m, GridMedium)]
        self.has_subsurface = any(
            getattr(m, "tag", None) == M.SUBSURFACE for m in mat_slots
        )

        # light list = scene lights + area lights + env light (lightsampler.cpp:6-10)
        self.lights = list(scene.lights) + area_lights
        if scene.env_light is not None:
            self.lights.append(scene.env_light)
        self.env_light = scene.env_light
        # which global shapes are emissive (for hit-side Le and MIS pdf)
        self.emissive_globals = {al.global_idx: al for al in area_lights}

        # Packet BVH over every primitive (analytic + triangles) once the
        # scene is big enough; tiny scenes keep dense brute force, which the
        # VPU wins outright (SURVEY.md §7 hard parts: "cbox has ~20 shapes").
        n_tris = sum(m.num_triangles() for m, _ in self.meshes)
        self.unified = None
        if self.meshes or inst_records or len(analytic_entities) + n_tris > 24:
            from pine_tpu.accel.packet import build_packet_accel

            self.unified = build_packet_accel(
                analytic_entities, self.meshes, instanced=inst_records
            )
        # mesh-scale scenes benefit from the wavefront coherence sort +
        # dead-lane tmax masking (integrators/path.py); tiny dense scenes do
        # not, and neither do INSTANCED-only scenes — the r4 honest A/B
        # (scripts_render_ab.py instanced) measured sort=1 at 10.2s vs
        # sort=0 at 6.6s on the 1024-rock field: the two-level kernel's
        # per-block top-level walk already culls by instance AABB, and the
        # sort's octant grouping splits blocks that shared a compact set of
        # instances.  PINE_SORT_RAYS=1 still forces it on.
        from pine_tpu.accel.pallas_traverse import GRID_MAX_PRIMS

        self.heavy_traversal = bool(self.unified) and any(
            g.get("_prim_aabbs") is not None
            and g["_prim_aabbs"].shape[0] > GRID_MAX_PRIMS
            for g in self.unified["groups"]
            if g["kind"] != "instanced"
        )
        # instanced-only scenes get the ORIGIN-major sort instead (see
        # _ray_sort_perm mode="origin"): bounce rays bin by originating
        # instance, which the octant-major key destroys
        self.inst_traversal = bool(self.unified) and any(
            g["kind"] == "instanced" for g in self.unified["groups"]
        )
        # world bounds for the wavefront coherence sort's origin morton key
        # (host-side floats: static at trace time)
        lo_w, up_w = scene.get_aabb()
        if not (np.isfinite(lo_w).all() and np.isfinite(up_w).all()):
            lo_w, up_w = np.zeros(3, np.float32), np.ones(3, np.float32)
        self.world_lo = np.asarray(lo_w, np.float32)
        self.world_span = float(max(float(np.max(up_w - lo_w)), 1e-6))

    # ---- device-side queries ----------------------------------------------
    def sort_perm(self, ro, rd, dead):
        """Coherence-sort permutation for a wavefront, honoring the auto
        gates; None when sorting is off.  The integrator shares one perm per
        bounce between the NEE any-hit and the next depth's intersect (an
        argsort costs ~2ms at 64k lanes — see _sort_rays_enabled).

        Mode selection: heavy mesh scenes take the octant-major key (r4 A/B
        winner); instanced-only scenes take the origin-major key
        (PINE_SORT_MODE=origin|off, see _ray_sort_perm)."""
        import os

        n = ro.shape[0]
        smode = "octant"
        if not _sort_rays_enabled(n, self.heavy_traversal):
            if not (
                getattr(self, "inst_traversal", False)
                and os.environ.get("PINE_SORT_MODE", "origin") == "origin"
                and _sort_rays_enabled(n, True)
            ):
                return None
            smode = "origin"
        f32 = jnp.float32
        return _ray_sort_perm(
            ro, rd, jnp.zeros((n,), f32),
            jnp.where(dead, -1.0, 1.0).astype(f32),
            self.world_lo, self.world_span, mode=smode,
        )

    def intersect(self, ro, rd, tmin, tmax, want_closest=True,
                  sort_perm="auto"):
        """Closest hit over all shape types. Returns (t, gidx, hit, mesh_tri)."""
        n = ro.shape[0]
        best_t = jnp.full((n,), BIG, jnp.float32)
        best_g = jnp.full((n,), -1, jnp.int32)
        mesh_tri = jnp.zeros((n,), jnp.int32)
        tmin_b = tmin[:, None] if jnp.ndim(tmin) == 1 else tmin
        tmax_b = tmax[:, None] if jnp.ndim(tmax) == 1 else tmax
        if self.unified is not None:
            from pine_tpu.accel.packet import packet_intersect

            tmin_f = jnp.broadcast_to(
                jnp.ravel(tmin) if jnp.ndim(tmin) else tmin, (n,)
            )
            tmax_f = jnp.broadcast_to(
                jnp.ravel(tmax) if jnp.ndim(tmax) else tmax, (n,)
            )
            if sort_perm == "auto":
                sort_perm = (
                    _ray_sort_perm(
                        ro, rd, tmin_f, tmax_f, self.world_lo, self.world_span
                    )
                    if _sort_rays_enabled(n, self.heavy_traversal)
                    else None
                )
            if sort_perm:
                perm, inv = sort_perm
                t, ent = packet_intersect(
                    self.unified, ro[perm], rd[perm], tmin_f[perm], tmax_f[perm]
                )
                t, ent = t[inv], ent[inv]
            else:
                t, ent = packet_intersect(self.unified, ro, rd, tmin_f, tmax_f)
            from pine_tpu.accel.packet import ent_to_gidx

            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_g = jnp.where(better, ent_to_gidx(self.unified, ent), best_g)
            mesh_tri = jnp.where(better, ent, mesh_tri)
        else:
            for tid, params in self.tables.items():
                tmat = I.INTERSECT[tid](params, ro, rd, tmin_b, tmax_b)
                t_min = jnp.min(tmat, axis=1)
                idx = jnp.argmin(tmat, axis=1).astype(jnp.int32)
                g = self.type_global[tid][idx]
                better = t_min < best_t
                best_t = jnp.where(better, t_min, best_t)
                best_g = jnp.where(better, g, best_g)
        for (sdf, gidx) in self.sdf_shapes:
            t = _sdf_march(sdf, ro, rd, jnp.ravel(tmin), jnp.minimum(jnp.ravel(tmax), best_t))
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_g = jnp.where(better, gidx, best_g)
        for (csg, gidx) in self.csg_shapes:
            from pine_tpu.scene.csg_intersect import csg_intersect

            t, hit_c = csg_intersect(
                csg, ro, rd, jnp.broadcast_to(tmin, (n,)), jnp.minimum(jnp.broadcast_to(tmax, (n,)), best_t)
            )
            better = hit_c & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_g = jnp.where(better, gidx, best_g)
        hit = best_t < BIG
        return best_t, best_g, hit, mesh_tri

    def any_hit(self, ro, rd, tmin, tmax, sort_perm="auto"):
        """Shadow-ray occlusion query; early-exit packet walk over the accel
        (the reference's hit() vs intersect() split, accel.h:13-16)."""
        n = ro.shape[0]
        tmin_f = jnp.broadcast_to(jnp.ravel(tmin) if jnp.ndim(tmin) else tmin, (n,))
        tmax_f = jnp.broadcast_to(jnp.ravel(tmax) if jnp.ndim(tmax) else tmax, (n,))
        if self.unified is None and not self.sdf_shapes and not self.csg_shapes:
            t, g, hit, _ = self.intersect(ro, rd, tmin, tmax)
            return hit
        occ = jnp.zeros((n,), bool)
        if self.unified is not None:
            from pine_tpu.accel.packet import packet_any_hit

            if sort_perm == "auto":
                sort_perm = (
                    _ray_sort_perm(
                        ro, rd, tmin_f, tmax_f, self.world_lo, self.world_span
                    )
                    if _sort_rays_enabled(n, self.heavy_traversal)
                    else None
                )
            if sort_perm:
                perm, inv = sort_perm
                occ = packet_any_hit(
                    self.unified, ro[perm], rd[perm], tmin_f[perm], tmax_f[perm]
                )[inv]
            else:
                occ = packet_any_hit(self.unified, ro, rd, tmin_f, tmax_f)
        else:
            for tid, params in self.tables.items():
                tmat = I.INTERSECT[tid](params, ro, rd, tmin_f[:, None], tmax_f[:, None])
                occ = occ | jnp.any(tmat < BIG, axis=1)
        for (sdf, gidx) in self.sdf_shapes:
            t = _sdf_march(sdf, ro, rd, tmin_f, tmax_f)
            occ = occ | (t < BIG)
        for (csg, gidx) in self.csg_shapes:
            from pine_tpu.scene.csg_intersect import csg_intersect

            t, hit_c = csg_intersect(csg, ro, rd, tmin_f, tmax_f)
            occ = occ | hit_c
        return occ

    def surface_info(self, gidx, p, mesh_tri=None):
        """Per-lane (p_corrected, n, uv) by masked per-type dispatch."""
        n_l = p.shape[0]
        tid_lane = self.g_type_dev[jnp.clip(gidx, 0, self.n_global - 1)]
        local = self.g_local_dev[jnp.clip(gidx, 0, self.n_global - 1)]
        out_p, out_n = p, jnp.zeros_like(p)
        out_uv = jnp.zeros((n_l, 2), jnp.float32)
        for tid, params in self.tables.items():
            rows = params[jnp.clip(local, 0, params.shape[0] - 1)]
            pc, nn, uv = I.SURFACE_INFO[tid](rows, p)
            m = (tid_lane == tid)[:, None]
            out_p = jnp.where(m, pc, out_p)
            out_n = jnp.where(m, nn, out_n)
            out_uv = jnp.where(m, uv, out_uv)
        for k, (sdf, g) in enumerate(self.sdf_shapes):
            nn = _sdf_normal(sdf, p)
            m = (gidx == g)[:, None]
            out_n = jnp.where(m, nn, out_n)
        for (csg, g) in self.csg_shapes:
            from pine_tpu.scene.csg_intersect import csg_normal

            nn = csg_normal(csg, p)
            m = (gidx == g)[:, None]
            out_n = jnp.where(m, nn, out_n)
        if self.unified is not None and self.meshes and mesh_tri is not None:
            from pine_tpu.accel.unified import unified_surface_info_triangle

            pc, nn, uv = unified_surface_info_triangle(self.unified, mesh_tri, p)
            m = (tid_lane == S.MESH_TYPE)[:, None]
            out_p = jnp.where(m, pc, out_p)
            out_n = jnp.where(m, nn, out_n)
            out_uv = jnp.where(m, uv, out_uv)
        if self.unified is not None and self.unified.get("inst_groups") and (
            mesh_tri is not None
        ):
            from pine_tpu.accel.packet import instanced_surface_info

            out_p, out_n, out_uv = instanced_surface_info(
                self.unified, mesh_tri, p, out_p, out_n, out_uv
            )
        return out_p, out_n, out_uv

    def light_pdf_at_hit(self, gidx, ro, rd, t, ns):
        """Area pdf of the hit emissive shape under the uniform light sampler
        (lightsampler.cpp pdf = shape.pdf / n_lights)."""
        n_lights = max(len(self.lights), 1)
        pdf = jnp.zeros(t.shape, jnp.float32)
        local = self.g_local_dev[jnp.clip(gidx, 0, self.n_global - 1)]
        for g, al in self.emissive_globals.items():
            tid = al.shape.type_id
            if tid == S.MESH_TYPE:
                area = max(al.shape.area(), 1e-20)
                from pine_tpu.core.vecmath import dot as _dot

                p_t = t**2 / jnp.maximum(area * jnp.abs(_dot(ns, rd)), 1e-20)
            else:
                params = self.tables[tid]
                rows = params[jnp.clip(local, 0, params.shape[0] - 1)]
                p_t = I.PDF[tid](rows, ro, rd, t, ns)
            pdf = jnp.where(gidx == g, p_t, pdf)
        return pdf / n_lights

    def transmittance(self, ro, rd, tmax, key=None, grid=True):
        """Chromatic transmittance along [0,tmax]: analytic for homogeneous
        media (integrator.cpp:75-81), ratio-tracked for grid media
        (medium.cpp:264-290).  `key` (N,) uint32 seeds the tracking; when
        omitted it derives from the ray-origin bits (origins are jittered per
        sample, so estimates decorrelate across samples).

        grid=False restricts to homogeneous media: the path integrator's
        per-segment beta must NOT re-apply grid extinction because the
        delta-tracking scatter pass already carries it stochastically
        (pass-through lanes = survived null-collision chain)."""
        n = ro.shape[0]
        tr = jnp.ones((n, 3), jnp.float32)
        if self.media:
            from pine_tpu.scene.csg_intersect import intervals_of

            for med in self.media:
                s, e = intervals_of(med.shape, ro, rd)
                lo = jnp.clip(s, 0.0, tmax[:, None])
                hi = jnp.clip(e, 0.0, tmax[:, None])
                overlap = jnp.sum(jnp.maximum(hi - lo, 0.0), axis=1)
                tr = tr * jnp.exp(-jnp.asarray(med.sigma_t) * overlap[:, None])
        if self.grid_media and grid:
            from pine_tpu.scene.media_track import grid_transmittance, ray_key

            if key is None:
                key = ray_key(ro, rd)
            for gi, med in enumerate(self.grid_media):
                tr = tr * grid_transmittance(med, ro, rd, tmax, key + jnp.uint32(gi))
        return tr

    def is_emissive_lane(self, gidx):
        if not self.emissive_globals:
            return jnp.zeros(gidx.shape, bool)
        m = jnp.zeros(gidx.shape, bool)
        for g in self.emissive_globals:
            m = m | (gidx == g)
        return m

    def emissive_le(self, gidx, ctx, wo):
        """Le of the hit emissive shape (material.h EmissiveMaterial::le)."""
        n_l = wo.shape[0]
        le = jnp.zeros((n_l, 3), jnp.float32)
        from pine_tpu.core.vecmath import dot

        for g, al in self.emissive_globals.items():
            color = N.eval_vec3_node(al.material.color, ctx, n_l)
            front = dot(wo, ctx["n"]) >= 0.0
            le_g = jnp.where(front[:, None], color, 0.0)
            le = jnp.where((gidx == g)[:, None], le_g, le)
        return le


def _sdf_march(sdf, ro, rd, tmin, tmax, steps=128, eps=1e-5):
    """Sphere-trace (geometry.cpp:730-753), vectorized with fixed step count.

    The march is clamped to the SDF's AABB slab interval: walking t toward
    FLOAT_MAX would evaluate script SDFs at ~1e38-magnitude points, where
    trig-based distance fields produce NaNs (which permanently poison this
    TPU's dispatch path)."""
    import jax

    n = ro.shape[0]
    lo, hi = sdf.get_aabb()
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd < 0, -1e-9, 1e-9), rd)
    t0b = (jnp.asarray(lo, jnp.float32) - ro) * inv
    t1b = (jnp.asarray(hi, jnp.float32) - ro) * inv
    enter = jnp.max(jnp.minimum(t0b, t1b), axis=-1)
    exit_ = jnp.min(jnp.maximum(t0b, t1b), axis=-1)
    t_lo = jnp.maximum(jnp.maximum(jnp.broadcast_to(tmin, (n,)), 0.0), enter)
    t_hi = jnp.minimum(jnp.broadcast_to(tmax, (n,)), exit_ + 1e-3)
    inside = t_lo <= t_hi

    def body(i, carry):
        t, done_hit, done_miss = carry
        p = ro + jnp.minimum(t, t_hi)[:, None] * rd
        d = sdf.fn(p)
        hit_now = (d < eps) & ~done_miss
        miss_now = (t >= t_hi) & ~done_hit
        done_hit = done_hit | hit_now
        done_miss = done_miss | miss_now
        active = ~(done_hit | done_miss)
        t = jnp.where(active, jnp.minimum(t + d, t_hi + 1e-3), t)
        return t, done_hit, done_miss

    t, hit, miss = jax.lax.fori_loop(
        0, steps, body, (t_lo, jnp.zeros((n,), bool), ~inside)
    )
    return jnp.where(hit & inside, t, BIG)


def _sdf_normal(sdf, p, ops=1e-4):
    """Central-difference normal (geometry.cpp:755-762; step enlarged for f32)."""
    from pine_tpu.core.vecmath import safe_normalize

    dx = jnp.asarray([ops, 0.0, 0.0])
    dy = jnp.asarray([0.0, ops, 0.0])
    dz = jnp.asarray([0.0, 0.0, ops])
    g = jnp.stack(
        [
            sdf.fn(p + dx) - sdf.fn(p - dx),
            sdf.fn(p + dy) - sdf.fn(p - dy),
            sdf.fn(p + dz) - sdf.fn(p - dz),
        ],
        axis=-1,
    )
    return safe_normalize(g)
