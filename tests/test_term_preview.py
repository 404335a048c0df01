"""Tests for the ANSI terminal preview (io/term_preview.py) — the in-terminal
display of the interactive/progressive viewer (path_opengl.cpp analog)."""
import numpy as np

from pine_tpu.io.term_preview import _box_downsample, ansi_frame, preview_enabled


def test_box_downsample_exact_means():
    img = np.arange(8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3)
    out = _box_downsample(img, 4, 3)
    assert out.shape == (4, 3, 3)
    np.testing.assert_allclose(out[0, 0], img[0:2, 0:2].mean(axis=(0, 1)))
    np.testing.assert_allclose(out[3, 2], img[6:8, 4:6].mean(axis=(0, 1)))


def test_ansi_frame_shape_and_codes():
    img = np.zeros((32, 64, 3), np.float32)
    img[:16] = [1.0, 0.0, 0.0]  # top half red -> foreground of first lines
    s = ansi_frame(img, max_cols=32, max_lines=16)
    lines = s.split("\n")
    # 32x64 at max 32 cols -> 32x16 pixels -> 8 text lines
    assert len(lines) == 8
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert "\x1b[38;2;255;0;0m" in lines[0]  # red top pixel, gamma(1)=255
    assert "\x1b[48;2;0;0;0m" in lines[-1]  # black bottom pixel
    assert lines[0].count("▀") == 32


def test_ansi_frame_odd_sizes_and_aspect():
    img = np.full((31, 7, 3), 0.5, np.float32)
    s = ansi_frame(img, max_cols=80, max_lines=24)
    assert s.count("▀") > 0  # no crash on odd dims; upscale never happens
    tall = ansi_frame(np.zeros((400, 10, 3), np.float32), max_cols=80, max_lines=10)
    assert len(tall.split("\n")) <= 10


def test_preview_env_override(monkeypatch):
    monkeypatch.setenv("PINE_TERM_PREVIEW", "1")
    assert preview_enabled(live=False)
    monkeypatch.setenv("PINE_TERM_PREVIEW", "0")
    assert not preview_enabled(live=True)
