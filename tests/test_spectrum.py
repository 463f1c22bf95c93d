"""Waterfall / IQ-inspection parity (utils/spectrum + CLI iq-show).

The reference's capture-inspection utilities are water_fall.m:3-12 (the
sliding-FFT power matrix with fftshifted rows) and
test_rx_iq_show.py::water_fall (its Python port). These tests pin the
framework's vectorized implementation to those exact semantics — a
complex tone at a known offset must land in the predicted fftshifted
row — and drive the CLI end to end on a synthetic capture.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from btle_tpu.utils.spectrum import occupancy, waterfall, waterfall_extent

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tone(f_hz, fs_hz, n, amp=100.0):
    t = np.arange(n) / fs_hz
    z = amp * np.exp(1j * 2 * np.pi * f_hz * t)
    return z.real, z.imag


class TestWaterfall:
    def test_tone_lands_in_expected_row(self):
        fs, fft = 8e6, 256
        # +1 MHz = bin 32 above DC; fftshift puts DC at row fft//2
        i, q = tone(1e6, fs, 4096)
        p = waterfall(i, q, fft_size=fft)
        assert p.shape == (fft, 4096 // fft)
        assert np.all(p.argmax(axis=0) == fft // 2 + 32)

    def test_negative_freq_below_center(self):
        fs, fft = 8e6, 128
        i, q = tone(-2e6, fs, 2048)
        p = waterfall(i, q, fft_size=fft)
        assert np.all(p.argmax(axis=0) == fft // 2 - fft // 4)

    def test_matches_reference_loop_semantics(self):
        """Column c == fftshift(|fft(iq[c*hop : c*hop+win], n)|^2) — the
        water_fall.m per-column loop, including win > fft truncation."""
        rng = np.random.default_rng(7)
        i, q = rng.normal(size=600), rng.normal(size=600)
        fft_size, win, hop = 64, 100, 37
        p = waterfall(i, q, fft_size=fft_size, win_len=win, hop=hop)
        z = i + 1j * q
        num_col = (600 - win) // hop + 1
        assert p.shape == (fft_size, num_col)
        for c in range(num_col):
            ref = np.abs(np.fft.fft(z[c * hop : c * hop + win],
                                    fft_size)) ** 2
            np.testing.assert_allclose(p[:, c], np.fft.fftshift(ref),
                                       rtol=1e-10)

    def test_extent_matches_reference_axis_math(self):
        t0, t1, f_lo, f_hi = waterfall_extent(8192, 4e6, 256, 256)
        assert t0 == 0.0
        assert t1 == pytest.approx((8192 // 256) * 256 / 4e6 * 1e6)
        assert (f_lo, f_hi) == (-2e6, 2e6)

    def test_too_short_capture_raises(self):
        with pytest.raises(ValueError):
            waterfall(np.zeros(10), np.zeros(10), fft_size=64)

    def test_occupancy_finds_the_tone(self):
        fs = 8e6
        rng = np.random.default_rng(3)
        i, q = tone(1e6, fs, 8192, amp=50.0)
        i = i + rng.normal(size=8192)
        q = q + rng.normal(size=8192)
        occ = occupancy(waterfall(i, q, fft_size=256), fs)
        assert occ, "tone not detected"
        assert abs(occ[0]["freq_offset_hz"] - 1e6) < fs / 256
        assert occ[0]["duty"] > 0.9


class TestCliIqShow:
    def _write_capture(self, tmp_path, fmt="f32"):
        fs = 8e6
        i, q = tone(0.5e6, fs, 65536, amp=80.0)
        iq = np.empty(2 * len(i), np.float32)
        iq[0::2], iq[1::2] = i, q
        path = tmp_path / "cap.bin"
        if fmt == "f32":
            (iq / 256.0).astype(np.float32).tofile(path)  # f32 wire scale
        else:
            iq.astype(np.int16).tofile(path)
        return path

    def _run(self, *argv):
        return subprocess.run(
            [sys.executable, "-m", "btle_tpu.cli", *argv],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": REPO}, timeout=300)

    def test_iq_show_summary_and_png(self, tmp_path):
        path = self._write_capture(tmp_path, "i16")
        out_png = tmp_path / "wf.png"
        r = self._run("iq-show", str(path), "--format", "i16",
                      "--rate", "8e6", "--out", str(out_png))
        assert r.returncode == 0, r.stderr
        assert "IQ pairs @ 8 Msps" in r.stdout
        assert "+500.0 kHz" in r.stdout, r.stdout
        try:
            import matplotlib  # noqa: F401

            assert out_png.exists() and out_png.stat().st_size > 1000
        except ImportError:
            assert "skipped" in r.stderr

    def test_iq_show_f32_with_center(self, tmp_path):
        path = self._write_capture(tmp_path, "f32")
        r = self._run("iq-show", str(path), "--format", "f32",
                      "--center", "2.402e9", "--max-samples", "32768")
        assert r.returncode == 0, r.stderr
        assert "2402.5 MHz" in r.stdout, r.stdout
