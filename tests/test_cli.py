"""CLI flag behavior (parity: src/cli/pine.cpp takes exactly one arg; the
--platform / --progressive / --interactive flags are TPU-runtime knobs with
no scene meaning, SURVEY §5.6)."""
import os
import subprocess
import sys


def test_platform_cpu_overrides_container_pin(tmp_path):
    """`--platform cpu` must land on the CPU backend even when the container
    pins JAX_PLATFORMS to the tunneled TPU in the environment (VERDICT r3
    weak 3): env vars are read before sitecustomize-pinned values can be
    unset, so the flag must go through jax.config.update."""
    scene = tmp_path / "probe.pine"
    scene.write_text(
        'img = draw([8, 8], (p: vec2): vec3 { return [p.x, p.y, 0.5]; });\n'
        'save(img, "%s/probe.png");\n'
        'println("backend-probe-done");\n' % tmp_path
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # simulate the container pin
    env.setdefault("PINE_ASSERT_BACKEND", "cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "pine_tpu", str(scene), "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "backend-probe-done" in proc.stdout
    assert (tmp_path / "probe.png").exists()


def test_platform_flag_validation():
    from pine_tpu.cli import main

    assert main(["scene.pine", "--platform"]) == 1
