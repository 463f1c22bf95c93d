"""Oversampled polyphase channelizer: one wideband capture -> 40 BLE channels.

This is capability the reference never had — its tools sniff one channel at
a time and the CLI rotates 37/38/39 serially (SURVEY.md P2). All 40 BLE
channel centres sit on the uniform grid 2402 + 2k MHz (k = 0..39, see
btle_tpu.spec.channels), so a wideband capture at FS = 80 Msps centred at
2442 MHz maps each channel to DFT bin m = (grid + 20) mod 40.

Structure (TPU-first):
  1. a 40-output-channel strided convolution — kernel m holds the
     prototype-filter taps whose index is congruent to m (mod 40), stride
     20 gives the 2x-oversampled 4 Msps per-channel rate. XLA lowers this
     onto the MXU via implicit im2col; I/Q ride the batch dimension.
  2. a 40-point DFT across branches as a 40x40 matrix product,
  3. the (-1)^(m k) phase correction that the half-band decimation
     (D = M/2) introduces.

The prototype filter is a Kaiser-designed lowpass with the same role as
the reference FPGA's AD9361 profile (pass 0.8 MHz / stop 1.1 MHz,
fpga/helpers/ad9361_fir_smpl8M_pass0.8_stop1.1.ftr).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.channels import CHANNEL_TO_GRID

M = 40                 # channels / DFT size
D = 20                 # decimation (output 2x oversampled: 4 Msps)
FS_MSPS = 80           # wideband input rate
CENTER_FREQ_HZ = 2_442_000_000
# Prototype length = M * TAPS_PER_BRANCH (1280 taps, Kaiser beta 10:
# stopband < -100 dB past 1.2 MHz vs the reference AD9361 profile's
# pass0.8/stop1.1). A 20-tap/branch (-62 dB) variant was measured and,
# counter-intuitively, ran ~15% SLOWER through the fused front end on
# v5e (Mosaic schedules the shorter contraction worse), so the longer
# prototype costs nothing — keep the better filter.
TAPS_PER_BRANCH = 32
DEFAULT_TAPS = M * TAPS_PER_BRANCH
# Conv input dtype: f32 keeps the filter bit-faithful to the float
# design; bf16 (with f32 accumulation) runs the fused conv on the MXU at
# full rate and bounds the composite-filter perturbation near -50 dB —
# far below the BLE operating SNR (the sensitivity suite passes either
# way). Measured on v5e before flipping the default.
_CONV_DTYPE = jnp.float32
# One dense DFT-folded conv vs grouped-conv + DFT matmuls: both are
# numerically validated against the same oracle; the grouped form
# measured faster on v5e (the 80x40x65 dense conv lowers poorly), so it
# is the default. Flip for experimentation.
_FUSED_CONV = False


def channel_to_bin(channel: int) -> int:
    """BLE channel number -> channelizer output bin."""
    return (int(CHANNEL_TO_GRID[channel]) + M // 2) % M


def bin_to_channel(m: int) -> int:
    from ..spec.channels import GRID_TO_CHANNEL

    return int(GRID_TO_CHANNEL[(m - M // 2) % M])


@lru_cache(maxsize=None)
def prototype_filter(num_taps: int = M * TAPS_PER_BRANCH, cutoff_mhz: float = 1.0,
                     beta: float = 10.0) -> np.ndarray:
    """Kaiser lowpass, cutoff at the channel half-width: flat to 0.8 MHz,
    ~-100 dB past 1.2 MHz (cf. the AD9361 pass0.8/stop1.1 profile)."""
    from scipy import signal

    h = signal.firwin(num_taps, cutoff_mhz, window=("kaiser", beta), fs=FS_MSPS)
    return (h / h.sum()).astype(np.float64)


@lru_cache(maxsize=None)
def _conv_kernel(num_taps: int, cutoff_mhz: float = 1.0) -> np.ndarray:
    """(M, 1, L) conv kernel: output channel p keeps taps tau = p (mod M).

    Cross-correlation form: out_p[k] = sum_w K[p, w] * x[kD + w]; we want
    u_p[k] = sum_{tau = p mod M} h[tau] * x[kD - tau + (L-1)] after
    pre-padding x by L-1, i.e. K[p, w] = h[L-1-w] * [L-1-w = p mod M].
    (Reference formulation, kept as the numerical oracle for the grouped
    polyphase kernel below.)
    """
    h = prototype_filter(num_taps, cutoff_mhz)
    L = len(h)
    k = np.zeros((M, 1, L), dtype=np.float32)
    w = np.arange(L)
    tau = L - 1 - w
    for p in range(M):
        sel = (tau % M) == p
        k[p, 0, sel] = h[tau[sel]]
    return k


def branch_columns() -> np.ndarray:
    """c(p): the decimated frame column each polyphase branch p reads
    (derivation in _poly_kernel's docstring). The ONE authoritative copy
    of the branch->column map — _poly_kernel, _fused_kernel and the
    sharded branch-split plan (dist.shard) all read it from here."""
    p = np.arange(M)
    c = np.where(p % D == 0, 0, np.where(p <= D - 1, D - p, 2 * D - p))
    return c.astype(np.int32)


@lru_cache(maxsize=None)
def _poly_kernel(num_taps: int, cutoff_mhz: float = 1.0):
    """Grouped polyphase kernel: the L-tap strided conv re-expressed over
    D=20 decimated streams so the compute is the TRUE polyphase work
    (M x L/M MACs per output frame) instead of an L-wide dense window.

    Derivation: with a 20·ceil(L/20)=L-sample left pad, output
    u_p[k] = sum_r h[p+40r] · x[20k + L - p - 40r]. Writing the padded
    stream as frames x20[j, c] = x[20j + c], every branch p reads ONE
    column c(p) with taps at window offsets s = base(p) - 2r:
        p = 0:      c = 0,      base = 64
        p in 1..19: c = 20 - p, base = 63
        p = 20:     c = 0,      base = 63
        p in 21..39:c = 40 - p, base = 62
    Each column feeds exactly two branches -> a feature_group_count = 20
    conv with kernel (M, 1, L/20 + 1). Returns (kernel, row_of_p) where
    conv output row row_of_p[p] is branch p.
    """
    h = prototype_filter(num_taps, cutoff_mhz)
    L = len(h)
    width = L // D + 1
    taps_per = L // M
    kern = np.zeros((M, 1, width), dtype=np.float32)
    row_of_p = np.zeros(M, dtype=np.int32)
    slot_used: dict[int, int] = {}
    cols = branch_columns()
    for p in range(M):
        c = int(cols[p])
        if p == 0:
            base = width - 1
        elif p <= D - 1 or p == D:
            base = width - 2
        else:
            base = width - 3
        slot = slot_used.get(c, 0)
        slot_used[c] = slot + 1
        j = 2 * c + slot
        row_of_p[p] = j
        for r in range(taps_per):
            kern[j, 0, base - 2 * r] = h[p + M * r]
    return kern, row_of_p


@lru_cache(maxsize=None)
def _dft_matrix():
    p = np.arange(M)
    m = np.arange(M)[:, None]
    e = np.exp(1j * 2 * np.pi * m * p / M)  # E[m, p]
    return e.real.astype(np.float32), e.imag.astype(np.float32)


@lru_cache(maxsize=None)
def _fused_kernel(num_taps: int, cutoff_mhz: float = 1.0):
    """Dense conv kernel with the DFT folded in: input channels are the
    20 I-frames + 20 Q-frames, output channels are y_i[0..39] + y_q[0..39]
    (before the (-1)^(mk) correction). One fat conv instead of
    grouped-conv + two matmuls: contraction 40x65 maps onto the MXU.
    """
    kern, row_of_p = _poly_kernel(num_taps, cutoff_mhz)
    width = kern.shape[2]
    # K_p[c, s]: branch p's taps laid out over (column, shift)
    kp = np.zeros((M, D, width), dtype=np.float64)
    cols = branch_columns()
    for p in range(M):
        kp[p, cols[p], :] = kern[row_of_p[p], 0, :]
    er, ei = _dft_matrix()
    g_r = np.einsum("mp,pcs->mcs", er.astype(np.float64), kp)
    g_i = np.einsum("mp,pcs->mcs", ei.astype(np.float64), kp)
    w = np.zeros((2 * M, 2 * D, width), dtype=np.float32)
    w[:M, :D] = g_r          # y_i from I-frames:  er . u_i
    w[:M, D:] = -g_i         # y_i from Q-frames: -ei . u_q
    w[M:, :D] = g_i          # y_q from I-frames:  ei . u_i
    w[M:, D:] = g_r          # y_q from Q-frames:  er . u_q
    return w


@partial(jax.jit, static_argnames=("num_taps", "has_context", "cutoff_mhz"))
def channelize(i, q, num_taps: int = M * TAPS_PER_BRANCH, has_context: bool = False,
               cutoff_mhz: float = 1.0):
    """(N,) wideband I/Q at 80 Msps -> (M, K) per-channel I/Q at 4 Msps.

    Output bin m covers BLE channel bin_to_channel(m).

    has_context=False: input is zero-padded on the left; K = N // D and
    the first ~L/D outputs carry filter warm-up.
    has_context=True: the FIRST num_taps-1 input samples are real history
    from the preceding stream (no warm-up garbage — required by the
    streaming sniffer so packets starting right at a block boundary
    demodulate cleanly); K = (N - (num_taps-1)) // D and output k aligns
    with input sample (num_taps-1) + k*D.
    """
    L = num_taps
    x = jnp.stack([i.astype(jnp.float32), q.astype(jnp.float32)])  # (2, N)
    # left pad to exactly L (one more than the filter history; the extra
    # sample is never read — it only makes the length frame-aligned),
    # right pad to a whole frame
    left = L if not has_context else 1
    n_all = left + x.shape[1]
    right = (-n_all) % D
    x = jnp.pad(x, ((0, 0), (left, right)))
    frames = x.reshape(2, x.shape[1] // D, D)          # (2, J, 20)
    if _FUSED_CONV:
        # input channels = 20 I-frames + 20 Q-frames; one dense conv
        # computes polyphase FIR *and* DFT (kernel has the DFT folded in)
        lhs = jnp.swapaxes(frames, 1, 2).reshape(1, 2 * D, -1)  # (1, 40, J)
        w = jnp.asarray(_fused_kernel(num_taps, cutoff_mhz))    # (80, 40, 65)
        y = jax.lax.conv_general_dilated(
            lhs.astype(_CONV_DTYPE), w.astype(_CONV_DTYPE),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[0]                                           # (80, K)
        y_i, y_q = y[:M], y[M:]
    else:
        # grouped polyphase conv (the measured-fastest lowering on v5e:
        # each of the 20 decimated streams feeds its two branches), then
        # the 40-point DFT as matmuls
        lhs = jnp.swapaxes(frames, 1, 2)               # (2, 20, J)
        kern, row_of_p = _poly_kernel(num_taps, cutoff_mhz)
        # precision HIGHEST: at DEFAULT the TPU lowers f32 convs to one
        # bf16 pass (~-48 dB effective stopband -> cross-channel ghosts)
        u = jax.lax.conv_general_dilated(
            lhs.astype(_CONV_DTYPE), jnp.asarray(kern).astype(_CONV_DTYPE),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=D,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                              # (2, M, K)
        u = jnp.take(u, jnp.asarray(row_of_p), axis=1)
        er, ei = _dft_matrix()
        er = jnp.asarray(er)
        ei = jnp.asarray(ei)
        u_i, u_q = u[0], u[1]
        hp = jax.lax.Precision.HIGHEST
        y_i = (jnp.dot(er, u_i, preferred_element_type=jnp.float32, precision=hp)
               - jnp.dot(ei, u_q, preferred_element_type=jnp.float32, precision=hp))
        y_q = (jnp.dot(er, u_q, preferred_element_type=jnp.float32, precision=hp)
               + jnp.dot(ei, u_i, preferred_element_type=jnp.float32, precision=hp))

    # (-1)^(m k) correction from D = M/2
    k_idx = jnp.arange(y_i.shape[1])
    m_idx = jnp.arange(M)[:, None]
    sign = jnp.where((m_idx * k_idx) % 2 == 0, 1.0, -1.0).astype(jnp.float32)
    return y_i * sign, y_q * sign


def compose_wideband(placements: list[tuple[int, int, np.ndarray, np.ndarray]],
                     num_samples: int, amplitude: float = 1.0,
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Place baseband bursts at their BLE channel carriers in one wideband
    stream — the TX-side inverse of the channelizer, and capability the
    single-radio reference cannot have (its board transmits one channel at
    a time, btle_tx.c:559-707).

    placements: (ble_channel, start_sample, i80, q80) per burst, all at
    FS_MSPS; bursts may share a channel and may overlap in time (they sum,
    like real airspace).
    """
    # complex64 accumulator + per-segment carrier phase: a 1 s plan at
    # 80 Msps is 640 MB here, not multiple GB (full-capture complex128 +
    # int64 arange would be ~24 B/sample)
    x = np.zeros(num_samples, dtype=np.complex64)
    for ch, start, ci, cq in placements:
        seg = slice(max(0, start), min(start + len(ci), num_samples))
        m = seg.stop - seg.start
        if m <= 0:
            continue
        f_off = (2_402_000_000 + 2_000_000 * int(CHANNEL_TO_GRID[ch]) - CENTER_FREQ_HZ)
        n_seg = seg.start + np.arange(m)  # absolute index keeps carriers coherent
        carrier = np.exp(1j * 2 * np.pi * (f_off / (FS_MSPS * 1e6)) * n_seg)
        lo = seg.start - start
        x[seg] += (amplitude * (np.asarray(ci[lo:lo + m])
                                + 1j * np.asarray(cq[lo:lo + m])) * carrier
                   ).astype(np.complex64)
    return x.real.astype(np.float32), x.imag.astype(np.float32)


def synthesize_wideband(channel_signals: dict[int, tuple[np.ndarray, np.ndarray]],
                        num_samples: int, offsets: dict[int, int] | None = None,
                        amplitude: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Test/benchmark helper: place per-channel 80 Msps baseband bursts at
    their BLE channel offsets in one wideband stream.

    channel_signals: {ble_channel: (i80, q80)} already at 80 Msps.
    offsets: optional start sample per channel.
    """
    return compose_wideband(
        [(ch, (offsets or {}).get(ch, 0), ci, cq)
         for ch, (ci, cq) in channel_signals.items()],
        num_samples, amplitude)
