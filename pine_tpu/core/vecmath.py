"""Vector math on batched jnp arrays (vectors live in the trailing axis).

Behavioral parity with reference src/pine/core/vecmath.h (coordinate_system,
look_at, rotate/translate/scale, spherical<->cartesian), re-expressed as
functional, batch-first JAX ops: every function accepts arrays shaped
``(..., 3)`` and maps elementwise over leading axes, so the same code serves a
single vector at scene-build time and a million-ray wavefront under jit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Pi = float(np.pi)
FLOAT_MAX = float(np.finfo(np.float32).max)


def dot(a, b):
    """Batched dot product over trailing axis; returns shape (...)."""
    return jnp.sum(a * b, axis=-1)


def dotk(a, b):
    """Like dot but keepdims, for broadcasting against vectors."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v, eps=0.0):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def safe_normalize(v):
    return normalize(v, eps=1e-20)


def cross(a, b):
    return jnp.cross(a, b)


def distance(a, b):
    return length(a - b)


def face_forward(v, n):
    """Flip v to lie in the hemisphere of n (vecmath.h face_same_hemisphere)."""
    return jnp.where(dotk(v, n) < 0.0, -v, v)


def coordinate_system(n):
    """Build tangent/bitangent for normal(s) n -> (t, b).

    Matches reference vecmath.h:1182-1188: branch on |n.x| > |n.y| choosing the
    cross axis, here as a vectorized select.
    """
    nx, ny = n[..., 0], n[..., 1]
    axis_y = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape)
    axis_x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    pick = (jnp.abs(nx) > jnp.abs(ny))[..., None]
    t = jnp.where(pick, jnp.cross(n, axis_y), jnp.cross(n, axis_x))
    t = safe_normalize(t)
    b = jnp.cross(n, t)
    return t, b


def to_local(n, w):
    """World->local transform where local z == n (interaction.h to_local)."""
    t, b = coordinate_system(n)
    return jnp.stack([dot(w, t), dot(w, b), dot(w, n)], axis=-1)


def to_world(n, w):
    t, b = coordinate_system(n)
    return (w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n)


def look_at(from_p, at, up=(0.0, 1.0, 0.0)):
    """Camera-to-world 4x4: columns = right,up,forward,position (vecmath.h:1172).

    Returns a numpy (4,4) matrix in column-major semantics matching the
    reference's mat4(x,y,z,w) columns; apply as ``m[:3,:3] @ v + m[:3,3]``.
    """
    from_p = np.asarray(from_p, np.float32)
    at = np.asarray(at, np.float32)
    up = np.asarray(up, np.float32)
    z = at - from_p
    z = z / np.linalg.norm(z)
    if abs(float(np.dot(z, up))) > 0.999:
        z = z + np.array([0.0, 0.0, 1e-5], np.float32)
        z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = from_p
    return m


# ---- 4x4 transform builders (host-side scene construction; numpy) ----------

def translate(v):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(v, np.float32)
    return m


def scale(v):
    m = np.eye(4, dtype=np.float32)
    v = np.asarray(v, np.float32)
    m[0, 0], m[1, 1], m[2, 2] = v[0], v[1], v[2]
    return m


def rotate_x(rad):
    c, s = np.cos(rad), np.sin(rad)
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rotate_y(rad):
    c, s = np.cos(rad), np.sin(rad)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rotate_z(rad):
    c, s = np.cos(rad), np.sin(rad)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def rotate(v):
    """Euler XYZ rotation (vecmath.h rotate(vec3))."""
    v = np.asarray(v, np.float32)
    return rotate_z(v[2]) @ rotate_y(v[1]) @ rotate_x(v[0])


def quaternion_to_matrix(q0, q1, q2, q3):
    """vecmath.h:1165-1171 (w,x,y,z ordering as in reference GLB import)."""
    return np.array(
        [
            [2 * (q0 * q0 + q1 * q1) - 1, 2 * (q1 * q2 - q0 * q3), 2 * (q1 * q3 + q0 * q2), 0],
            [2 * (q1 * q2 + q0 * q3), 2 * (q0 * q0 + q2 * q2) - 1, 2 * (q2 * q3 - q0 * q1), 0],
            [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1), 2 * (q0 * q0 + q3 * q3) - 1, 0],
            [0, 0, 0, 1],
        ],
        np.float32,
    )


def apply_mat4(m, p):
    """Apply 4x4 transform to point(s) p of shape (...,3)."""
    return p @ jnp.asarray(m[:3, :3]).T + jnp.asarray(m[:3, 3])


def apply_mat4_dir(m, d):
    return d @ jnp.asarray(m[:3, :3]).T


# ---- spherical <-> cartesian (vecmath.h:1197-1217) --------------------------

def spherical_to_cartesian(phi, sin_theta, cos_theta):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def unit_square_to_cartesian(sc):
    phi = sc[..., 0] * (2 * Pi)
    theta = sc[..., 1] * Pi
    return spherical_to_cartesian(phi, jnp.sin(theta), jnp.cos(theta))


def phi2pi(x, y):
    phi = jnp.arctan2(y, x)
    return jnp.where(phi < 0.0, 2 * Pi + phi, phi)


def cartesian_to_spherical(d):
    return jnp.stack(
        [phi2pi(d[..., 0], d[..., 1]), jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))],
        axis=-1,
    )


def cartesian_to_unit_square(d):
    sc = cartesian_to_spherical(d)
    return sc / jnp.array([2 * Pi, Pi], sc.dtype)
