"""PRL arithmetic/comparison semantics over Python + PrlVec/PrlMat values.

Replicates the reference's operator registrations (vecmath.cpp:133-309,
jit.cpp i32/f32 fast paths): C-style integer division/modulo, elementwise
vector ops, matrix*vector / matrix*matrix, string concatenation with
to_string of any operand.  Works identically for eager numpy values and jax
tracers (see values.xp).
"""
from __future__ import annotations

import numpy as np

from pine_tpu.prl.values import PrlMat, PrlVec, is_int_value, prl_to_string, xp


def _c_div(a, b):
    if is_int_value(a) and is_int_value(b):
        if _any_traced(a, b):  # traced i32: same C truncation, lane-wise
            m = xp(a, b)
            q = abs(a) // m.maximum(abs(b), 1)
            return m.where((a >= 0) == (b >= 0), q, -q)
        q = abs(a) // abs(b)
        return int(q if (a >= 0) == (b >= 0) else -q)
    return a / b


def _c_mod(a, b):
    if is_int_value(a) and is_int_value(b):
        if _any_traced(a, b):
            return a - _c_div(a, b) * b
        return int(a - _c_div(a, b) * b)
    return np.fmod(a, b) if not hasattr(a, "aval") else a % b


def _vec_ready(x, other):
    """Unwrap PrlVec data; leave scalars."""
    return x.data if isinstance(x, (PrlVec, PrlMat)) else x


def binary(op, a, b):
    # texture-node arithmetic builds node trees (node.cpp operator regs)
    from pine_tpu.scene import nodes as N

    if isinstance(a, N.Node) or isinstance(b, N.Node):
        conv = lambda x: x if isinstance(x, N.Node) else N.Constant(
            np.asarray(x.data, np.float32) if isinstance(x, PrlVec) else float(x)
        )
        if op in ("+", "-", "*", "/", "^"):
            return N.Binary(op, conv(a), conv(b))
        raise TypeError(f"op {op} is not defined for texture nodes")
    # string concatenation
    if op == "+" and (isinstance(a, str) or isinstance(b, str)):
        return prl_to_string(a) + prl_to_string(b)
    if op in ("==", "!=") and isinstance(a, str) and isinstance(b, str):
        return (a == b) if op == "==" else (a != b)
    if op == "&&":
        return _truthy(a) and _truthy(b) if not _any_traced(a, b) else _vec_ready(a, b) & _vec_ready(b, a)
    if op == "||":
        return _truthy(a) or _truthy(b) if not _any_traced(a, b) else _vec_ready(a, b) | _vec_ready(b, a)

    if isinstance(a, PrlMat) or isinstance(b, PrlMat):
        return _mat_op(op, a, b)
    if isinstance(a, PrlVec) or isinstance(b, PrlVec):
        return _vec_op(op, a, b)
    return _scalar_op(op, a, b)


def _any_traced(*vals):
    return xp(*vals) is not np


def _truthy(x):
    return bool(x)


def _scalar_op(op, a, b):
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return _c_div(a, b)
    if op == "%":
        return _c_mod(a, b)
    if op == "^":
        m = xp(a, b)
        r = m.power(m.float32(a) if m is np else a, b) if m is not np else float(np.power(np.float64(a), b))
        return r
    if op == "<":
        return a < b
    if op == ">":
        return a > b
    if op == "<=":
        return a <= b
    if op == ">=":
        return a >= b
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    raise TypeError(f"unsupported scalar op {op}")


def _vec_op(op, a, b):
    m = xp(a, b)
    av = a.data if isinstance(a, PrlVec) else a
    bv = b.data if isinstance(b, PrlVec) else b
    # In PRL a non-vec operand is always a scalar; under batched tracing it
    # may carry lane axes, so give it a trailing component axis to broadcast
    # against the vector's component axis.
    if not isinstance(a, PrlVec) and getattr(av, "ndim", 0) >= 1:
        av = av[..., None]
    if not isinstance(b, PrlVec) and getattr(bv, "ndim", 0) >= 1:
        bv = bv[..., None]
    a_int = a.is_int if isinstance(a, PrlVec) else is_int_value(a)
    b_int = b.is_int if isinstance(b, PrlVec) else is_int_value(b)
    out_int = a_int and b_int
    if op == "+":
        r = av + bv
    elif op == "-":
        r = av - bv
    elif op == "*":
        r = av * bv
    elif op == "/":
        if out_int:
            q = abs(av) // m.maximum(abs(bv), 1) if m is not np else np.abs(av) // np.maximum(np.abs(bv), 1)
            r = m.where((av >= 0) == (bv >= 0), q, -q)
        else:
            r = av / bv
    elif op == "%":
        r = av % bv
    elif op == "^":
        r = m.power(av, bv)
        out_int = False
    elif op in ("==", "!="):
        eq = m.all(av == bv)
        return bool(eq) if m is np else (eq if op == "==" else ~eq)
    else:
        raise TypeError(f"unsupported vector op {op}")
    if not out_int and hasattr(r, "dtype") and np.issubdtype(np.dtype(r.dtype) if m is np else r.dtype, np.integer):
        r = r.astype(np.float32)
    return PrlVec(r, out_int)


def _mat_op(op, a, b):
    if op == "*":
        if isinstance(a, PrlMat) and isinstance(b, PrlMat):
            m = xp(a, b)
            return PrlMat(m.matmul(a.data, b.data))
        if isinstance(a, PrlMat) and isinstance(b, PrlVec):
            m = xp(a, b)
            an = a.data.shape[-1]
            bd = b.data.astype(np.float32) if b.is_int and m is np else b.data
            if b.n == an:
                return PrlVec(m.einsum("...ij,...j->...i", a.data, bd))
            if an == 4 and b.n == 3:
                # mat4 * vec3: affine point transform (vecmath mat4*(vec3,1))
                r = m.einsum("...ij,...j->...i", a.data[..., :3, :3], bd) + a.data[..., :3, 3]
                return PrlVec(r)
            raise TypeError("mat*vec dimension mismatch")
        if isinstance(a, PrlVec) and isinstance(b, PrlMat):
            raise TypeError("vec*mat is not defined in PRL")
        # mat * scalar not registered in reference
        raise TypeError("mat * scalar is not defined in PRL")
    if op == "+":
        return PrlMat(a.data + b.data)
    raise TypeError(f"unsupported matrix op {op}")


def unary(op, x):
    if op == "neg":
        if isinstance(x, PrlVec):
            return PrlVec(-x.data, x.is_int)
        if isinstance(x, PrlMat):
            return PrlMat(-x.data)
        return -x
    if op == "pos":
        return x
    if op == "not":
        return not x if not _any_traced(x) else ~x
    raise TypeError(f"unsupported unary op {op}")
