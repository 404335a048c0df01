"""JIT compilation of hot host-side PRL loops.

The reference compiles whole scripts to native code through LLVM at -O3
(jit.cpp:2219-2354), so compute-heavy scripts like scenes/benchmark.pine run
at C speed.  The eager tree-walk interpreter here detects hot affine ``for``
loops (and long-running ``while`` loops) and hands the whole nest to XLA on
the host CPU:

- **batched tier**: if every outer variable the loop mutates is a pure
  ``+=``/``-=`` reduction, the iterations are independent — run them as
  LANES-wide vectorized slabs (data-dependent inner loops lower to
  ``lax.while_loop`` with per-lane masks, exactly the wavefront lowering
  trace_flow.py applies to device lambdas) and combine the masked per-lane
  deltas afterwards.
- **sequential tier**: otherwise carry every mutated variable through one
  scalar ``lax.while_loop`` — exact loop-carried semantics at XLA speed.

A conservative purity pre-scan gates compilation: only whitelisted math
builtins and user ``fn``s with pure bodies; no break/continue/return, no
lambdas, no prints, no RNG, no scene mutation.  Anything else (or any error
while compiling) falls back to the unchanged eager path; pure bodies make a
discarded trace side-effect free.  Compiled programs are cached per loop AST
node — every outer value the body reads is passed as a program argument, so
re-dispatch never bakes stale state (the one documented exception: values a
called ``fn`` captures through *its* closure are compiled in once, mirroring
the reference's compile-whole-script-once model).

Set PINE_NO_LOOPJIT=1 to disable, PINE_LOOPJIT_DEBUG=1 to log bail reasons.
"""
from __future__ import annotations

import os

import numpy as np

from pine_tpu.prl import ast as A
from pine_tpu.prl.trace_flow import assigned_names
from pine_tpu.prl.values import PrlMat, PrlVec

MIN_TRIP = 4096          # below this, eager interpretation beats a compile
MAX_LANES = 65536        # slab width for the batched tier
SMALL_NESTED_TRIP = 64   # nested literal for-loops up to this unroll in-trace
WHILE_HOT_ITERS = 20000  # eager while iterations before a compile attempt

PURE_BUILTINS = frozenset(
    (
        "min max abs clamp lerp sqr sqrt fract floor ceil powi pow exp log2 "
        "log log10 sin cos tan acos asin sinh cosh tanh atan2 normalize "
        "length distance dot cross sum max_value min_value max_axis min_axis "
        "mat2 mat3 mat4 identity3x3 identity4x4 transpose determinant "
        "inverse solve rotate_x rotate_y rotate_z rotate translate scale "
        "look_at lookat coordinate_system spherical_to_cartesian "
        "unit_square_to_cartesian cartesian_to_spherical "
        "cartesian_to_unit_square sample_disk_polar sample_disk_concentric "
        "cosine_weighted_hemisphere uniform_sphere uniform_hemisphere "
        "inverse_uniform_sphere inverse_uniform_hemisphere pnoise pnoise2d "
        "pnoise3d fbm fbm2d fbm3d"
    ).split()
)

_CACHE = {}     # id(loop node) -> {"node": node, "env": [env], key: jitted fn}
_ACTIVE = [False]  # re-entrancy guard: no compile attempts inside a compile


class _Bail(Exception):
    pass


def _debug(msg):
    if os.environ.get("PINE_LOOPJIT_DEBUG"):
        print(f"[loop_jit] {msg}")


def _disabled():
    return bool(os.environ.get("PINE_NO_LOOPJIT"))


# ---------------------------------------------------------------------------
# AST walking
# ---------------------------------------------------------------------------

def _children(n):
    for f in getattr(n, "__dataclass_fields__", ()):
        v = getattr(n, f)
        if isinstance(v, A.Node):
            yield v
        elif isinstance(v, (list, tuple)):
            for e in v:
                if isinstance(e, A.Node):
                    yield e
                elif isinstance(e, tuple):
                    for ee in e:
                        if isinstance(ee, A.Node):
                            yield ee


def _referenced(node, out):
    """All Id / Call names mentioned anywhere under `node`."""
    if isinstance(node, A.Id) or isinstance(node, A.Call):
        out.add(node.name)
    for c in _children(node):
        _referenced(c, out)
    return out


def _is_pure_reduction(body, nm):
    """True iff `nm` appears ONLY as the direct target of statement-level
    `nm += e` / `nm -= e` (so its in-loop value is never read and the lane
    deltas combine by summation)."""
    ok = [True]

    def visit(node, parent, grand):
        if isinstance(node, A.Id) and node.name == nm:
            good = (
                isinstance(parent, A.Binary)
                and parent.op in ("+=", "-=")
                and parent.a is node
                and isinstance(grand, A.ExprStmt)
            )
            if not good:
                ok[0] = False

    def walk(node, parent=None, grand=None):
        visit(node, parent, grand)
        for c in _children(node):
            walk(c, node, parent)

    walk(body)
    return ok[0]


# ---------------------------------------------------------------------------
# purity pre-scan
# ---------------------------------------------------------------------------

def _static_trip(node):
    """Trip count of a For when init/cond/inc are all integer literals."""
    info = _affine(node)
    if info is None:
        return None
    _, begin_e, end_e, step_e, strict = info
    vals = []
    for e in (begin_e, end_e):
        if not (isinstance(e, A.NumLit) and isinstance(e.value, int)):
            return None
        vals.append(e.value)
    if step_e is None:
        step = 1
    elif isinstance(step_e, A.NumLit) and isinstance(step_e.value, int):
        step = step_e.value
    else:
        return None
    if step <= 0:
        return None
    begin, end = vals
    return _trip_count(begin, end, step, strict)


def _trip_count(begin, end, step, strict):
    span = end - begin
    if strict:
        return max(0, -(-span // step))
    return max(0, span // step + 1)


def _scan_pure(interp, env, node, seen_fns, in_fn=False, loop_depth=0):
    """Raise _Bail unless `node` is safe to execute under a discarded trace
    (no side effects) and lowerable (no unsupported control flow).

    `return` is fine inside a *called fn* (ReturnEx stays within the call);
    directly in the compiled loop body it would exit the enclosing scope.
    `break`/`continue` are fine inside a nested loop (concrete nested loops
    run eagerly in-trace; traced ones error cleanly -> eager fallback) but
    not at the compiled loop's own level."""
    k = type(node)
    if k is A.ReturnStmt and not in_fn:
        raise _Bail("ReturnStmt in loop body")
    if k in (A.BreakStmt, A.ContinueStmt) and loop_depth == 0:
        raise _Bail(f"{k.__name__} at compiled-loop level")
    if k in (A.FnDef, A.ClassDef, A.Lambda):
        raise _Bail(f"{k.__name__} in loop body")
    if k is A.For:
        t = _static_trip(node)
        if t is None or t > SMALL_NESTED_TRIP:
            raise _Bail("nested for-loop is not small/literal")
    if k is A.Call:
        _scan_callee(interp, env, node.name, seen_fns)
    child_depth = loop_depth + 1 if k in (A.For, A.While) else loop_depth
    for c in _children(node):
        _scan_pure(interp, env, c, seen_fns, in_fn, child_depth)


def _scan_callee(interp, env, name, seen_fns):
    from pine_tpu.prl.interp import PrlFunction

    cell = env.find(name)
    if cell is not None:
        v = cell.get()
        if isinstance(v, PrlFunction):
            if v not in seen_fns:
                seen_fns.add(v)
                _scan_pure(interp, v.env, v.node.body, seen_fns, in_fn=True)
            return
        raise _Bail(f"call target `{name}` is not a pure fn")
    if name in PURE_BUILTINS:
        return
    raise _Bail(f"call to non-whitelisted `{name}`")


# ---------------------------------------------------------------------------
# loop shape analysis
# ---------------------------------------------------------------------------

def _affine(node):
    """Match `for (v := begin; v < end; ++v | v += step)`; both PRL range
    forms desugar to exactly this (parser.for_)."""
    init, cond, inc = node.init, node.cond, node.inc
    if not (isinstance(init, A.Decl) and init.kind == "declare"):
        return None
    name = init.name
    if not (
        isinstance(cond, A.Binary)
        and cond.op in ("<", "<=")
        and isinstance(cond.a, A.Id)
        and cond.a.name == name
    ):
        return None
    if (
        isinstance(inc, A.Unary)
        and inc.op == "preinc"
        and isinstance(inc.e, A.Id)
        and inc.e.name == name
    ):
        step_e = None
    elif (
        isinstance(inc, A.Binary)
        and inc.op == "+="
        and isinstance(inc.a, A.Id)
        and inc.a.name == name
    ):
        step_e = inc.b
    else:
        return None
    return name, init.expr, cond.b, step_e, cond.op == "<"


def _concrete_int(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, np.integer)):
        return int(v)
    return None


def _num(v):
    return isinstance(v, (bool, int, float, np.integer, np.floating, np.bool_))


def _leaf_kind(v):
    """Classify a value for shadow/carry purposes; None if not compilable."""
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, PrlVec):
        return "veci" if v.is_int else "vec"
    if isinstance(v, PrlMat):
        return "mat"
    return None


def _classify(env, body, loopvar):
    """Split mutated names into loop-locals / reductions / carries."""
    names = assigned_names(body)
    names.discard(loopvar)
    reds, carries = [], []
    for nm in sorted(names):
        cell = env.find(nm)
        if cell is None:
            continue  # created fresh in the body's block scope each iteration
        kind = _leaf_kind(cell.get())
        if kind is None:
            raise _Bail(f"`{nm}` mutated but not a compilable value")
        if kind in ("int", "float", "vec", "veci") and _is_pure_reduction(body, nm):
            reds.append((nm, kind))
        else:
            carries.append((nm, kind))
    return reds, carries


def _collect_reads(interp, env, nodes, exclude):
    """Outer values the body reads -> passed as program arguments.  Returns
    (read specs, resolved-fn id tuple for the cache key)."""
    from pine_tpu.prl.interp import PrlFunction

    refs = set()
    for n in nodes:
        _referenced(n, refs)
    reads, fn_ids = [], []
    for nm in sorted(refs - exclude):
        cell = env.find(nm)
        if cell is None:
            continue  # builtin (purity scan already vetted calls)
        v = cell.get()
        if isinstance(v, PrlFunction):
            fn_ids.append((nm, id(v)))
            continue
        kind = _leaf_kind(v)
        if kind is None:
            raise _Bail(f"read of non-compilable `{nm}`")
        reads.append((nm, kind))
    return reads, tuple(fn_ids)


# ---------------------------------------------------------------------------
# value <-> argument conversion
# ---------------------------------------------------------------------------

def _to_arg(v, kind):
    if kind == "bool":
        return np.bool_(v)
    if kind == "int":
        return np.int32(v)
    if kind == "float":
        return np.float32(v)
    return np.asarray(v.data)  # vec / veci / mat


def _wrap_tracer(x, kind):
    if kind in ("vec", "veci"):
        return PrlVec(x, kind == "veci")
    if kind == "mat":
        return PrlMat(x)
    return x


def _from_result(x, kind):
    x = np.asarray(x)
    if kind == "bool":
        return bool(x)
    if kind == "int":
        return int(x)
    if kind == "float":
        return float(x)
    if kind in ("vec", "veci"):
        return PrlVec(x, kind == "veci")
    return PrlMat(x)


def _zero_delta(kind, v):
    if kind == "int":
        return 0
    if kind == "float":
        return 0.0
    import jax.numpy as jnp

    dt = jnp.int32 if kind == "veci" else jnp.float32
    return PrlVec(jnp.zeros(v.n, dt), kind == "veci")


def _combine_reduction(init, kind, total):
    if kind == "int":
        return int(init) + int(total)
    if kind == "float":
        return float(init) + float(total)
    data = np.asarray(init.data) + np.asarray(total)
    return PrlVec(data, kind == "veci")


def _cpu_device():
    import jax

    return jax.local_devices(backend="cpu")[0]


# ---------------------------------------------------------------------------
# tiers
# ---------------------------------------------------------------------------

def _entry_for(node, env):
    entry = _CACHE.get(id(node))
    if entry is None or entry["node"] is not node:
        entry = {"node": node, "env": [env]}
        _CACHE[id(node)] = entry
    entry["env"][0] = env
    return entry


def _run_batched(interp, node, env, loopvar, begin, end, step, strict, trip,
                 reds, reads, fn_ids):
    import jax
    import jax.numpy as jnp

    from pine_tpu.prl.interp import Env

    lanes = min(trip, MAX_LANES)
    entry = _entry_for(node, env)
    holder = entry["env"]
    key = ("batch", lanes, step, strict, tuple(reds), tuple(reads), fn_ids)
    jf = entry.get(key)
    if jf is None:
        def fn(base, end_v, last_v, *read_vals):
            scope = Env(holder[0])
            i = base + step * jnp.arange(lanes, dtype=jnp.int32)
            valid = (i < end_v) if strict else (i <= end_v)
            # inert lanes repeat the last real iteration (keeps inner
            # data-dependent while-loops terminating); deltas masked out below
            i = jnp.where(valid, i, last_v)
            scope.declare(loopvar, i)
            for (nm, kind), rv in zip(reads, read_vals):
                scope.declare(nm, _wrap_tracer(rv, kind))
            red_cells = []
            for nm, kind in reds:
                c = scope.declare(nm, _zero_delta(kind, holder[0].find(nm).get()))
                red_cells.append((c, kind))
            interp.exec_block(node.body, scope)
            outs = []
            for c, kind in red_cells:
                d = c.get()
                raw = jnp.asarray(d.data if isinstance(d, PrlVec) else d)
                want = (lanes,) if kind in ("int", "float") else (lanes, raw.shape[-1])
                if raw.shape != want:
                    raw = jnp.broadcast_to(raw, want)
                m = valid if raw.ndim == 1 else valid[:, None]
                outs.append(jnp.where(m, raw, 0).sum(axis=0))
            return tuple(outs)

        jf = jax.jit(fn)
        entry[key] = jf

    red_cells = [(env.find(nm), nm, kind) for nm, kind in reds]
    inits = [c.get() for c, _, _ in red_cells]
    read_args = [_to_arg(env.find(nm).get(), kind) for nm, kind in reads]
    last = begin + step * (trip - 1)
    totals = None
    with jax.default_device(_cpu_device()):
        for s in range(0, trip, lanes):
            outs = jf(np.int32(begin + s * step), np.int32(end),
                      np.int32(last), *read_args)
            outs = [np.asarray(o, np.int64) if np.issubdtype(np.asarray(o).dtype, np.integer)
                    else np.asarray(o) for o in outs]
            totals = outs if totals is None else [a + b for a, b in zip(totals, outs)]
    for (cell, _, kind), init, tot in zip(red_cells, inits, totals or []):
        cell.set(_combine_reduction(init, kind, tot))


def _run_sequential(interp, node, env, cond_node, body, inc_node,
                    shadow, reads, fn_ids, loop_init=None):
    """One scalar lax.while_loop carrying `shadow` (name, kind) values.
    `loop_init` = (loopvar, begin) for For loops; None for While."""
    import jax

    from pine_tpu.prl.interp import Env
    from pine_tpu.prl.trace_flow import trace_while

    entry = _entry_for(node, env)
    holder = entry["env"]
    key = ("seq", tuple(shadow), tuple(reads), fn_ids,
           None if loop_init is None else loop_init[0])
    jf = entry.get(key)
    if jf is None:
        def fn(loop_i, shadow_vals, read_vals):
            scope = Env(holder[0])
            if loop_init is not None:
                scope.declare(loop_init[0], loop_i)
            for (nm, kind), v in zip(shadow, shadow_vals):
                scope.declare(nm, _wrap_tracer(v, kind))
            for (nm, kind), v in zip(reads, read_vals):
                scope.declare(nm, _wrap_tracer(v, kind))
            c = interp.eval(cond_node, scope)
            trace_while(interp, c, cond_node, body, inc_node, scope)
            out = []
            for nm, kind in shadow:
                v = scope.find(nm).get()
                out.append(v.data if isinstance(v, (PrlVec, PrlMat)) else v)
            return tuple(out)

        jf = jax.jit(fn)
        entry[key] = jf

    shadow_cells = [env.find(nm) for nm, _ in shadow]
    shadow_vals = tuple(_to_arg(c.get(), k) for c, (_, k) in zip(shadow_cells, shadow))
    read_vals = tuple(_to_arg(env.find(nm).get(), k) for nm, k in reads)
    loop_i = np.int32(loop_init[1]) if loop_init is not None else np.int32(0)
    with jax.default_device(_cpu_device()):
        outs = jf(loop_i, shadow_vals, read_vals)
    for cell, (_, kind), o in zip(shadow_cells, shadow, outs):
        cell.set(_from_result(o, kind))


# ---------------------------------------------------------------------------
# entry points (hooked from interp.exec_elem)
# ---------------------------------------------------------------------------

def _mark_nocompile(node):
    """Remember a structural (value-independent) bail so repeated executions
    of the same For statement skip the AST scans (the While tier's flag)."""
    entry = _CACHE.setdefault(id(node), {"node": node})
    if entry.get("node") is node:
        entry["nocompile"] = True


def maybe_run_compiled_for(interp, node, env):
    """Try to compile-and-run an A.For.  True = done; False = run eagerly."""
    if _ACTIVE[0] or _disabled():
        return False
    entry = _CACHE.get(id(node))
    if entry is not None and entry.get("node") is node and entry.get("nocompile"):
        return False
    info = _affine(node)
    if info is None:
        _mark_nocompile(node)
        return False
    loopvar, begin_e, end_e, step_e, strict = info
    structural = True  # _Bail before any value-dependent check => cacheable
    try:
        seen = set()
        bound_nodes = [begin_e, end_e] + ([step_e] if step_e is not None else [])
        for e in bound_nodes:
            _scan_pure(interp, env, e, seen)
        mut = assigned_names(node.body) | {loopvar}
        refs = set()
        for e in bound_nodes:
            _referenced(e, refs)
        if refs & mut:
            raise _Bail("loop bound depends on loop state")
        structural = False
        begin = _concrete_int(interp.eval(begin_e, env))
        end = _concrete_int(interp.eval(end_e, env))
        step = 1 if step_e is None else _concrete_int(interp.eval(step_e, env))
        if begin is None or end is None or step is None or step <= 0:
            raise _Bail("bounds are not concrete positive-step ints")
        trip = _trip_count(begin, end, step, strict)
        if trip < MIN_TRIP:
            return False
        structural = True
        _scan_pure(interp, env, node.body, seen)
        structural = False
        reds, carries = _classify(env, node.body, loopvar)
        exclude = mut | {nm for nm, _ in reds} | {nm for nm, _ in carries}
        _ACTIVE[0] = True
        try:
            if not carries:
                reads, fn_ids = _collect_reads(interp, env, [node.body], exclude)
                _run_batched(interp, node, env, loopvar, begin, end, step,
                             strict, trip, reds, reads, fn_ids)
            else:
                # the traced cond/inc also reference outer values -> args too
                reads, fn_ids = _collect_reads(
                    interp, env, [node.body, node.cond, node.inc], exclude
                )
                shadow = sorted(set(reds + carries))
                _run_sequential(interp, node, env, node.cond, node.body,
                                node.inc, shadow, reads, fn_ids,
                                loop_init=(loopvar, begin))
        finally:
            _ACTIVE[0] = False
        return True
    except _Bail as b:
        if structural:
            _mark_nocompile(node)
        _debug(f"for@{node.sl}: {b}")
        return False
    except Exception as e:  # discarded trace of a pure body: safe to retry eagerly
        _debug(f"for@{node.sl}: {type(e).__name__}: {e}")
        return False


def maybe_run_compiled_while(interp, node, env):
    """Continue a long-running eager While under XLA from its current state.
    True = the loop ran to completion here; False = keep going eagerly."""
    if _ACTIVE[0] or _disabled():
        return False
    entry = _CACHE.get(id(node))
    if entry is not None and entry.get("node") is node and entry.get("nocompile"):
        return False
    try:
        seen = set()
        _scan_pure(interp, env, node.cond, seen)
        _scan_pure(interp, env, node.body, seen)
        names = assigned_names(node.body) | assigned_names(node.cond)
        shadow = []
        for nm in sorted(names):
            cell = env.find(nm)
            if cell is None:
                continue
            kind = _leaf_kind(cell.get())
            if kind is None:
                raise _Bail(f"`{nm}` mutated but not a compilable value")
            shadow.append((nm, kind))
        reads, fn_ids = _collect_reads(
            interp, env, [node.cond, node.body], set(n for n, _ in shadow)
        )
        _ACTIVE[0] = True
        try:
            _run_sequential(interp, node, env, node.cond, node.body, None,
                            shadow, reads, fn_ids, loop_init=None)
        finally:
            _ACTIVE[0] = False
        return True
    except _Bail as b:
        _debug(f"while@{node.sl}: {b}")
        _entry_for(node, env)["nocompile"] = True
        return False
    except Exception as e:
        _debug(f"while@{node.sl}: {type(e).__name__}: {e}")
        _entry_for(node, env)["nocompile"] = True
        return False
