"""Procedurally author assets/house.glb — the multi-material test asset.

The reference ships scenes/house.pine (CachedPathIntegrator over a
multi-material GLB, house.pine:4-10) but its asset scenes/house/house.glb is
absent from the repo, so the scene is unrunnable there.  This script builds a
house-class GLB from scratch so the framework has a committed, reproducible
multi-material gate: several meshes under a TRS node tree (translation +
quaternion rotation), baseColor TEXTURES (procedural brick + roof-tile PNGs),
baseColorFactor materials at varied metallic/roughness, and an emissive
window material — exactly the glTF subset io/gltf.py consumes
(fileio.cpp:146-571 parity).

Usage: python scripts_house.py  -> writes assets/house.glb
"""
from __future__ import annotations

import io
import json
import struct

import numpy as np


# ---------------------------------------------------------------------------
# minimal GLB writer (accessors without strides, PNG images in the buffer)
# ---------------------------------------------------------------------------

class GlbBuilder:
    def __init__(self):
        self.buf = bytearray()
        self.buffer_views = []
        self.accessors = []
        self.images = []
        self.textures = []
        self.materials = []
        self.meshes = []
        self.nodes = []
        self.roots = []

    def _view(self, raw: bytes):
        off = len(self.buf)
        self.buf.extend(raw)
        while len(self.buf) % 4:
            self.buf.append(0)
        self.buffer_views.append(
            {"buffer": 0, "byteOffset": off, "byteLength": len(raw)}
        )
        return len(self.buffer_views) - 1

    def _accessor(self, arr, comp_type, type_str, minmax=False):
        view = self._view(np.ascontiguousarray(arr).tobytes())
        acc = {
            "bufferView": view,
            "componentType": comp_type,
            "count": len(arr),
            "type": type_str,
        }
        if minmax:
            acc["min"] = np.asarray(arr).min(0).tolist()
            acc["max"] = np.asarray(arr).max(0).tolist()
        self.accessors.append(acc)
        return len(self.accessors) - 1

    def add_image_png(self, rgb01):
        from PIL import Image

        img = Image.fromarray((np.clip(rgb01, 0, 1) * 255).astype(np.uint8))
        bio = io.BytesIO()
        img.save(bio, format="PNG")
        view = self._view(bio.getvalue())
        self.images.append({"bufferView": view, "mimeType": "image/png"})
        self.textures.append({"source": len(self.images) - 1})
        return len(self.textures) - 1

    def add_material(self, name, base=(1, 1, 1, 1), metallic=0.0,
                     roughness=1.0, tex=None, emissive=None):
        mat = {"name": name}
        if emissive is not None:
            mat["emissiveFactor"] = list(emissive)
        pbr = {
            "baseColorFactor": list(base),
            "metallicFactor": metallic,
            "roughnessFactor": roughness,
        }
        if tex is not None:
            pbr["baseColorTexture"] = {"index": tex}
        mat["pbrMetallicRoughness"] = pbr
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_mesh(self, prims):
        """prims: list of (verts, normals, uvs|None, faces u32 (n,3), mat)."""
        out = []
        for verts, normals, uvs, faces, mat in prims:
            attrs = {
                "POSITION": self._accessor(
                    verts.astype(np.float32), 5126, "VEC3", minmax=True
                ),
                "NORMAL": self._accessor(normals.astype(np.float32), 5126, "VEC3"),
            }
            if uvs is not None:
                attrs["TEXCOORD_0"] = self._accessor(
                    uvs.astype(np.float32), 5126, "VEC2"
                )
            idx = self._accessor(
                faces.reshape(-1, 1).astype(np.uint32), 5125, "SCALAR"
            )
            out.append({"attributes": attrs, "indices": idx, "material": mat})
        self.meshes.append({"primitives": out})
        return len(self.meshes) - 1

    def add_node(self, mesh=None, translation=None, rotation=None, scale=None,
                 children=None, root=True):
        node = {}
        if mesh is not None:
            node["mesh"] = mesh
        if translation is not None:
            node["translation"] = list(translation)
        if rotation is not None:
            node["rotation"] = list(rotation)  # (x, y, z, w)
        if scale is not None:
            node["scale"] = list(scale)
        if children is not None:
            node["children"] = children
        self.nodes.append(node)
        idx = len(self.nodes) - 1
        if root:
            self.roots.append(idx)
        return idx

    def write(self, path):
        gltf = {
            "asset": {"version": "2.0", "generator": "pine_tpu scripts_house"},
            "scene": 0,
            "scenes": [{"nodes": self.roots}],
            "nodes": self.nodes,
            "meshes": self.meshes,
            "materials": self.materials,
            "accessors": self.accessors,
            "bufferViews": self.buffer_views,
            "buffers": [{"byteLength": len(self.buf)}],
        }
        if self.images:
            gltf["images"] = self.images
            gltf["textures"] = self.textures
            gltf["samplers"] = [{}]
        js = json.dumps(gltf, separators=(",", ":")).encode()
        while len(js) % 4:
            js += b" "
        binc = bytes(self.buf)
        total = 12 + 8 + len(js) + 8 + len(binc)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(binc), 0x004E4942))
            f.write(binc)


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def grid_quad(o, eu, ev, nu, nv, uv_scale=1.0):
    """Subdivided quad: origin o, edges eu/ev, (nu x nv) cells."""
    o, eu, ev = (np.asarray(x, np.float32) for x in (o, eu, ev))
    us = np.linspace(0, 1, nu + 1, dtype=np.float32)
    vs = np.linspace(0, 1, nv + 1, dtype=np.float32)
    U, V = np.meshgrid(us, vs, indexing="ij")
    verts = o + U[..., None] * eu + V[..., None] * ev
    verts = verts.reshape(-1, 3)
    n = np.cross(eu, ev)
    n = n / np.linalg.norm(n)
    normals = np.tile(n, (len(verts), 1)).astype(np.float32)
    uvs = np.stack([U * uv_scale, V * uv_scale], -1).reshape(-1, 2)
    idx = np.arange((nu + 1) * (nv + 1)).reshape(nu + 1, nv + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[:-1, 1:].ravel()
    d = idx[1:, 1:].ravel()
    faces = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]
    ).astype(np.uint32)
    return verts, normals, uvs, faces


def merge(parts):
    vs, ns, ts, fs = [], [], [], []
    off = 0
    for v, n, t, f in parts:
        vs.append(v)
        ns.append(n)
        ts.append(t)
        fs.append(f + off)
        off += len(v)
    return (
        np.concatenate(vs), np.concatenate(ns), np.concatenate(ts),
        np.concatenate(fs),
    )


def box(center, half, nu=4, uv_scale=1.0):
    """Axis-aligned box from 6 outward grid quads."""
    cx, cy, cz = center
    hx, hy, hz = half
    quads = [
        # +x / -x
        ([cx + hx, cy - hy, cz - hz], [0, 2 * hy, 0], [0, 0, 2 * hz]),
        ([cx - hx, cy - hy, cz + hz], [0, 2 * hy, 0], [0, 0, -2 * hz]),
        # +y / -y
        ([cx - hx, cy + hy, cz - hz], [0, 0, 2 * hz], [2 * hx, 0, 0]),
        ([cx - hx, cy - hy, cz + hz], [0, 0, -2 * hz], [2 * hx, 0, 0]),
        # +z / -z
        ([cx + hx, cy - hy, cz + hz], [-2 * hx, 0, 0], [0, 2 * hy, 0]),
        ([cx - hx, cy - hy, cz - hz], [2 * hx, 0, 0], [0, 2 * hy, 0]),
    ]
    return merge([grid_quad(o, eu, ev, nu, nu, uv_scale) for o, eu, ev in quads])


# ---------------------------------------------------------------------------
# procedural textures
# ---------------------------------------------------------------------------

def brick_texture(size=128):
    y, x = np.mgrid[0:size, 0:size] / size
    row = np.floor(y * 8)
    xs = x + np.where(row % 2 == 0, 0.0, 0.0625)
    mortar = ((y * 8) % 1 < 0.12) | ((xs * 4) % 1 < 0.06)
    h = np.sin(np.floor(xs * 4) * 12.9898 + row * 78.233) * 0.5 + 0.5
    brick = np.stack(
        [0.55 + 0.2 * h, 0.22 + 0.08 * h, 0.16 + 0.05 * h], -1
    )
    return np.where(mortar[..., None], np.array([0.75, 0.73, 0.7]), brick)


def tile_texture(size=128):
    y, x = np.mgrid[0:size, 0:size] / size
    row = np.floor(y * 6)
    xs = x + np.where(row % 2 == 0, 0.0, 1 / 12)
    edge = ((y * 6) % 1 < 0.15) | ((xs * 6) % 1 < 0.1)
    h = np.sin(np.floor(xs * 6) * 37.7 + row * 17.3) * 0.5 + 0.5
    tile = np.stack([0.25 + 0.1 * h, 0.28 + 0.1 * h, 0.38 + 0.12 * h], -1)
    return np.where(edge[..., None], np.array([0.12, 0.13, 0.16]), tile)


# ---------------------------------------------------------------------------
# the house
# ---------------------------------------------------------------------------

def build(path="assets/house.glb", tess=10):
    g = GlbBuilder()
    brick = g.add_image_png(brick_texture())
    tiles = g.add_image_png(tile_texture())
    m_brick = g.add_material("brick", tex=brick, roughness=0.9)
    m_tiles = g.add_material("roof", tex=tiles, roughness=0.7)
    m_wood = g.add_material("wood", base=(0.32, 0.18, 0.08, 1), roughness=0.55)
    m_trim = g.add_material("trim", base=(0.85, 0.85, 0.82, 1), roughness=0.35)
    m_metal = g.add_material("chimney-cap", base=(0.7, 0.7, 0.72, 1),
                             metallic=1.0, roughness=0.25)
    m_glow = g.add_material("window", emissive=(6.0, 4.5, 2.5))
    m_grass = g.add_material("ground", base=(0.16, 0.34, 0.12, 1), roughness=1.0)
    m_stone = g.add_material("plinth", base=(0.5, 0.5, 0.52, 1), roughness=0.8)

    W, D, H = 2.0, 1.5, 1.4  # half-width(x), half-depth(z), wall height
    t = tess

    # walls: one mesh, brick texture (watertight box sides, no top/bottom)
    walls = merge([
        grid_quad([-W, 0, -D], [2 * W, 0, 0], [0, H, 0], 2 * t, t, 2.0),
        grid_quad([W, 0, D], [-2 * W, 0, 0], [0, H, 0], 2 * t, t, 2.0),
        grid_quad([W, 0, -D], [0, 0, 2 * D], [0, H, 0], 2 * t, t, 2.0),
        grid_quad([-W, 0, D], [0, 0, -2 * D], [0, H, 0], 2 * t, t, 2.0),
    ])
    mesh_walls = g.add_mesh([(walls[0], walls[1], walls[2], walls[3], m_brick)])

    # gables (triangle-ish end caps above the side walls) + roof slopes
    ridge_h = H + 0.9
    gable = merge([
        grid_quad([W, H, -D], [0, 0, 2 * D], [0, ridge_h - H, 0], t, t, 1.0),
        grid_quad([-W, H, D], [0, 0, -2 * D], [0, ridge_h - H, 0], t, t, 1.0),
    ])
    # clip gables to triangles by collapsing verts above the roof line
    gv = gable[0].copy()
    zfrac = np.abs(gv[:, 2]) / D
    max_y = H + (ridge_h - H) * np.maximum(0.0, 1.0 - zfrac)
    gv[:, 1] = np.minimum(gv[:, 1], max_y)
    mesh_gable = g.add_mesh([(gv, gable[1], gable[2], gable[3], m_brick)])

    ov = 0.25  # roof overhang
    roof = merge([
        grid_quad([-W - ov, H - 0.05, -D - ov], [2 * (W + ov), 0, 0],
                  [0, ridge_h - H + 0.05, D + ov], 2 * t, t, 3.0),
        grid_quad([W + ov, H - 0.05, D + ov], [-2 * (W + ov), 0, 0],
                  [0, ridge_h - H + 0.05, -D - ov], 2 * t, t, 3.0),
    ])
    mesh_roof = g.add_mesh([(roof[0], roof[1], roof[2], roof[3], m_tiles)])

    # door + frame (front = -z face), slightly proud of the wall
    door = grid_quad([-0.35, 0, -D - 0.02], [0.7, 0, 0], [0, 0.95, 0], 4, 6, 1.0)
    frame = grid_quad([-0.45, 0, -D - 0.015], [0.9, 0, 0], [0, 1.05, 0], 2, 2, 1.0)
    mesh_door = g.add_mesh([
        (door[0], door[1], door[2], door[3], m_wood),
        (frame[0], frame[1], frame[2], frame[3], m_trim),
    ])

    # two emissive windows on the front face
    win_parts = []
    for wx in (-1.3, 1.3):
        win_parts.append(
            grid_quad([wx - 0.3, 0.55, -D - 0.02], [0.6, 0, 0], [0, 0.6, 0], 2, 2)
        )
    wv = merge(win_parts)
    mesh_win = g.add_mesh([(wv[0], wv[1], wv[2], wv[3], m_glow)])

    # plinth under the walls
    pl = box([0, -0.08, 0], [W + 0.12, 0.1, D + 0.12], nu=3)
    mesh_plinth = g.add_mesh([(pl[0], pl[1], pl[2], pl[3], m_stone)])

    # chimney: box + metallic cap, in a TRS node (rotated about y)
    ch = box([0, 0, 0], [0.18, 0.6, 0.18], nu=4, uv_scale=1.0)
    cap = box([0, 0.64, 0], [0.24, 0.05, 0.24], nu=2)
    mesh_chimney = g.add_mesh([
        (ch[0], ch[1], ch[2], ch[3], m_brick),
        (cap[0], cap[1], cap[2], cap[3], m_metal),
    ])

    # ground
    gr = grid_quad([-12, -0.18, -12], [24, 0, 0], [0, 0, 24], 2 * t, 2 * t, 8.0)
    mesh_ground = g.add_mesh([(gr[0], gr[1], gr[2], gr[3], m_grass)])

    # node tree: house root translated up by the plinth; chimney rotated 15deg
    # about y (quaternion) and placed on the rear roof slope
    s15, c15 = np.sin(np.radians(7.5)), np.cos(np.radians(7.5))
    chim = g.add_node(mesh=mesh_chimney, translation=[1.1, ridge_h + 0.15, 0.5],
                      rotation=[0.0, float(s15), 0.0, float(c15)], root=False)
    kids = [
        g.add_node(mesh=m, root=False)
        for m in (mesh_walls, mesh_gable, mesh_roof, mesh_door, mesh_win,
                  mesh_plinth)
    ]
    g.add_node(translation=[0, 0.02, 0], children=kids + [chim])
    g.add_node(mesh=mesh_ground)

    g.write(path)
    n_tris = sum(
        g.accessors[p["indices"]]["count"] // 3
        for m in g.meshes for p in m["primitives"]
    )
    return path, n_tris, len(g.materials)


if __name__ == "__main__":
    path, n_tris, n_mats = build()
    print(f"wrote {path}: {n_tris} triangles, {n_mats} materials")
