"""Waterfall / spectrogram IQ inspection.

The reference ships two capture-inspection utilities for eyeballing IQ
before (or instead of) decoding it: a sliding-FFT waterfall
(host/ble_fpga_ctl/water_fall.m:1-38, ported to Python in
host/ble_fpga_ctl/test_rx_iq_show.py::water_fall) and a raw IQ viewer
(host/ble_fpga_ctl/test_rx_iq_show.py).  This module is the framework's
equivalent, generalized to every wire format the CLI reads (i8/i16/f32/
ILA-csv) and to the 80 Msps wideband captures the TPU pipeline consumes.

Semantics match the reference exactly: each column is |FFT(window)|^2
with the window advanced by ``hop`` samples, rows fft-shifted so DC sits
in the middle and frequency ascends upward.  The compute is plain NumPy —
a full 100 ms @8 Msps inspection is ~1 GFLOP of FFT, far below the point
where shipping it through the device tunnel pays (the hot decode paths
live in wideband/ and rx/; this is an operator-facing magnifying glass
and stays host-side like the reference's).
"""

from __future__ import annotations

import numpy as np


def waterfall(i, q, fft_size: int = 256, win_len: int | None = None,
              hop: int | None = None) -> np.ndarray:
    """Power spectrogram of an IQ capture.

    Returns a ``(fft_size, num_col)`` float array: column c is
    ``fftshift(|FFT(iq[c*hop : c*hop+win_len], fft_size)|^2)`` — the
    reference's water_fall (water_fall.m:3-12) with its three knobs
    (fft_size, num_sample_feed_to_fft, sample_resolution) kept under
    these names:

    win_len: samples fed to each FFT (default fft_size; may exceed it,
        in which case NumPy truncates exactly like the MATLAB original).
    hop: window advance per column (default win_len — non-overlapping).
    """
    if win_len is None:
        win_len = fft_size
    if hop is None:
        hop = win_len
    if hop <= 0 or win_len <= 0 or fft_size <= 0:
        raise ValueError("fft_size, win_len and hop must be positive")
    z = (np.asarray(i, dtype=np.float64)
         + 1j * np.asarray(q, dtype=np.float64))
    num_col = (len(z) - win_len) // hop + 1
    if num_col <= 0:
        raise ValueError(
            f"capture too short: {len(z)} samples < win_len {win_len}")
    # one strided view -> one batched FFT (the reference loops per column)
    windows = np.lib.stride_tricks.as_strided(
        z, shape=(num_col, win_len), strides=(z.strides[0] * hop,
                                              z.strides[0]))
    # np.fft.fft(n=fft_size) truncates/zero-pads per column exactly like
    # the MATLAB fft(x, n) the reference calls
    spec = np.fft.fft(windows, fft_size, axis=1)
    power = np.abs(spec) ** 2
    return np.fft.fftshift(power, axes=1).T


def waterfall_extent(num_samples: int, fs_hz: float, win_len: int,
                     hop: int) -> tuple[float, float, float, float]:
    """(t0_us, t1_us, f_lo_hz, f_hi_hz) axis extent for a waterfall of a
    ``num_samples``-long capture — the reference's axis math
    (water_fall.m:17-21: time in us at ``hop/fs`` resolution, frequency
    spanning [-fs/2, +fs/2))."""
    num_col = (num_samples - win_len) // hop + 1
    dt_us = hop / fs_hz * 1e6
    return (0.0, num_col * dt_us, -fs_hz / 2.0, fs_hz / 2.0)


def occupancy(power: np.ndarray, fs_hz: float,
              threshold_db: float = 12.0) -> list[dict]:
    """Per-frequency-bin activity summary of a waterfall: bins whose peak
    power rises ``threshold_db`` above the capture's median noise floor,
    with their center frequency offset and duty cycle.  This is the
    machine-readable counterpart of looking at the plot (the reference
    only has the plot); the CLI prints it so headless runs still get an
    answer."""
    fft_size = power.shape[0]
    floor = float(np.median(power)) or 1e-30
    thr = floor * 10.0 ** (threshold_db / 10.0)
    out = []
    for row in range(fft_size):
        p = power[row]
        peak = float(p.max())
        if peak < thr:
            continue
        out.append({
            "freq_offset_hz": (row - fft_size // 2) * fs_hz / fft_size,
            "peak_db": 10.0 * np.log10(peak / floor),
            "duty": float((p > thr).mean()),
        })
    out.sort(key=lambda d: -d["peak_db"])
    return out
