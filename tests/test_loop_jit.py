"""Host-side PRL loop compilation (prl/loop_jit.py).

The reference JITs whole scripts to native code (jit.cpp:2219-2354); its
speed contract is scenes/benchmark.pine (Collatz, benchmark.pine:1-21).
These tests pin both tiers' correctness against the eager interpreter and
ground truth, plus the fallback rules.
"""
import numpy as np
import pytest

from pine_tpu.prl import loop_jit
from pine_tpu.prl.interp import Interpreter


def run(src, monkeypatch=None, no_jit=False):
    if monkeypatch is not None and no_jit:
        monkeypatch.setenv("PINE_NO_LOOPJIT", "1")
    out = []
    itp = Interpreter(out=out.append)
    itp.run(src)
    if monkeypatch is not None and no_jit:
        monkeypatch.delenv("PINE_NO_LOOPJIT")
    return out, itp


def compiled_tiers():
    """Number of loop-AST cache entries holding at least one compiled tier."""
    return sum(
        1
        for e in loop_jit._CACHE.values()
        if any(isinstance(k, tuple) for k in e)
    )


@pytest.fixture(autouse=True)
def _fresh_cache():
    loop_jit._CACHE.clear()
    yield
    loop_jit._CACHE.clear()


def collatz_truth(lo, hi, outer):
    def steps(n):
        it = 0
        while n != 1:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            it += 1
        return it

    return outer * sum(steps(n) for n in range(lo, hi))


def test_collatz_batched_tier(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
sum = 0;
for N in 0..3 {
    for n in 1..4000 {
        x = n;
        iter = 0;
        while (x != 1) {
            if (x % 2 == 0) { x = x / 2; }
            else { x = x * 3 + 1; }
            iter += 1;
        }
        sum += iter;
    }
}
println(sum);
"""
    out, _ = run(src)
    assert out == [str(collatz_truth(1, 4000, 3))]
    assert compiled_tiers() >= 1


def test_batched_matches_eager_float_and_vec_reductions(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
acc = 0.0;
v = [0.0, 0.0, 0.0];
for i in 0..3000 {
    acc += sin(i * 0.01) * 0.5;
    v += [i * 0.001, 1.0, cos(i * 0.02)];
}
println(acc);
println(v.x, ' ', v.y, ' ', v.z);
"""
    out_jit, itp = run(src)
    assert compiled_tiers() == 1
    out_eager, itp2 = run(src, monkeypatch, no_jit=True)
    acc_j, acc_e = itp.get_var("acc"), itp2.get_var("acc")
    assert acc_j == pytest.approx(acc_e, rel=1e-4)
    vj, ve = itp.get_var("v").data, itp2.get_var("v").data
    np.testing.assert_allclose(np.asarray(vj), np.asarray(ve), rtol=1e-4)


def test_sequential_tier_loop_carried(monkeypatch):
    """`a` is read and overwritten each iteration -> not a reduction ->
    sequential lax.while_loop carries it exactly."""
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
a = 1;
b = 0;
for i in 0..6000 {
    t = a + b;
    b = a;
    a = t % 1000003;
}
println(a, ' ', b);
"""
    out_jit, _ = run(src)
    assert compiled_tiers() == 1
    out_eager, _ = run(src, monkeypatch, no_jit=True)
    assert out_jit == out_eager


def test_slab_boundaries(monkeypatch):
    """Trips that are not multiples of the slab width mask the tail lanes."""
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 16)
    monkeypatch.setattr(loop_jit, "MAX_LANES", 100)
    src = """
sum = 0;
for i in 5..258 { sum += i; }
println(sum);
"""
    out, _ = run(src)
    assert out == [str(sum(range(5, 258)))]
    assert compiled_tiers() == 1


def test_step_range_form(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 16)
    src = """
sum = 0;
for i in 2~3~2000 { sum += i; }
println(sum);
"""
    out, _ = run(src)
    assert out == [str(sum(range(2, 2001, 3)))]
    assert compiled_tiers() == 1


def test_outer_reads_are_arguments_not_constants(monkeypatch):
    """The same loop AST re-runs with a changed outer value (compile cache
    must not bake `k` in)."""
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
fn body(k: i32): i32 {
    sum = 0;
    for i in 0..2000 { sum += i * k; }
    return sum;
}
println(body(1), ' ', body(7));
"""
    out, _ = run(src)
    base = sum(range(2000))
    assert out == [f"{base} {7 * base}"]
    assert compiled_tiers() == 1


def test_impure_body_falls_back_eager(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 16)
    src = """
sum = 0;
for i in 0..40 {
    if (i % 20 == 0) { println('tick ', i); }
    sum += 1;
}
println(sum);
"""
    out, _ = run(src)
    assert out == ["tick 0", "tick 20", "40"]
    assert compiled_tiers() == 0


def test_scene_mutation_falls_back_eager(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 16)
    src = """
scene := Scene();
scene.add('d', Diffuse([0.5, 0.5, 0.5]));
n = 0;
for i in 0..64 {
    scene.add(Sphere([i * 1.0, 0, 0], 0.1), 'd');
    n += 1;
}
println(n);
"""
    out, itp = run(src)
    assert out == ["64"]
    assert compiled_tiers() == 0
    assert len(itp.get_var("scene").geometries) == 64


def test_nested_small_literal_for_unrolls(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
sum = 0;
for i in 0..2000 {
    for k in 0..4 { sum += i + k; }
}
println(sum);
"""
    out, _ = run(src)
    truth = sum(i + k for i in range(2000) for k in range(4))
    assert out == [str(truth)]
    assert compiled_tiers() == 1


def test_pure_user_fn_calls_compile(monkeypatch):
    monkeypatch.setattr(loop_jit, "MIN_TRIP", 512)
    src = """
fn f(x: i32): i32 { return x * x % 97; }
sum = 0;
for i in 0..3000 { sum += f(i); }
println(sum);
"""
    out, _ = run(src)
    # PRL precedence quirk (jit.cpp:657-699): `%` binds tighter than `*`,
    # so `x * x % 97` is x * (x % 97) — pinned against the eager evaluator
    assert out == [str(sum(i * (i % 97) for i in range(3000)))]
    assert compiled_tiers() == 1


def test_hot_while_compiles_continuation(monkeypatch):
    import pine_tpu.prl.interp as interp_mod

    monkeypatch.setattr(interp_mod, "_LOOP_HOT_ITERS", 50)
    src = """
x = 0;
s = 0;
while x < 30000 {
    s = (s + x) % 1000003;
    x += 1;
}
println(x, ' ', s);
"""
    out, _ = run(src)
    s = 0
    for x in range(30000):
        s = (s + x) % 1000003
    assert out == [f"30000 {s}"]
    assert compiled_tiers() == 1


def test_benchmark_scene_runs_exact():
    """scenes/benchmark.pine at 1/100 outer scale, exact reference value."""
    src = open("scenes/benchmark.pine").read().replace("0..100", "0..1")
    out, _ = run(src)
    assert out == [str(collatz_truth(1, 50000, 1))]
    assert compiled_tiers() >= 1
