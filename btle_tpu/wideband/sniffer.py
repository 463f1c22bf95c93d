"""Wideband sniffer: channelize + decode all 40 BLE channels per block.

The per-chip streaming configuration from BASELINE.json config 4: one
80 Msps wideband IQ stream is split by the polyphase channelizer and all
40 channels run the dense receive pipeline in a single jitted program
(vmap over the channel axis); the host walks the tiny candidate lists to
apply per-channel span-eating and PDU parsing.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ll.pdu import parse_adv_header, parse_adv_payload, parse_ll_header, parse_ll_payload
from ..rx.pipeline import decode_block, required_halo
from ..spec import bits as B
from ..spec import crc24 as C
from ..spec import whitening as W
from ..spec.constants import ADV_ACCESS_ADDRESS_HEX
from .channelizer import D, DEFAULT_TAPS, M, bin_to_channel, channelize

CH_SPS = 4  # channelizer output is 4 Msps = 4 samples/symbol
# Symbol-lag phase-difference decisions (the golden model's demod,
# btlelib.py:395-400): after the channelizer's 1 MHz lowpass this reaches
# the reference BER anchors (~11 dB @ 0 ppm), ~2 dB better than the C
# tool's 1-sample lag. Measured: 60/60 packets at 11 dB vs 41/60 at lag 1.
CH_LAG = 4


# Per-phy channel-filter passband default (prototype_filter cutoff, MHz).
# LE 1M: the classic 1.0 MHz half-channel cutoff (AD9361 pass0.8/stop1.1
# class). LE 2M: the 2 Msym/s GFSK spectrum extends past +-1 MHz, and
# the 1.0 MHz prototype truncates it (~2-4 dB AWGN decode-floor penalty)
# — but a 2 MHz-wide signal on the 2 MHz channel grid also OVERLAPS its
# neighbors on air, so widening the RX filter admits adjacent-channel
# interference. Both sides measured in round 5:
#   * AWGN-limited (sparse traffic), tools/dev_2m_cutoff.py: the -4 dB
#     floor cell decodes 2/40 at 1.0 MHz vs 15/40 at 1.2 (optimal;
#     1.3 -> 12, 1.4 -> 6 as decimation aliasing folds in from
#     4 - cutoff MHz); the 1M control keeps 1.0 optimal at 1M.
#   * Interference-limited (dense simultaneous traffic), the 198-packet
#     12-connection 2M soak scene (tools/soak_fused_tpu.py --cutoff):
#     1.0 -> 0 missing, 1.1 -> 5 missing, 1.2 -> 12 missing.
# The DEFAULT is the interference-robust 1.0; AWGN-limited deployments
# (long-range links, quiet spectrum) select the sensitivity-optimized
# CUTOFF_MHZ_2M_SENS via WidebandConfig.cutoff_mhz — it buys ~1 dB at
# the 2M noise floor (BER_CURVES.md table).
CUTOFF_MHZ_1M = 1.0
CUTOFF_MHZ_2M = 1.0
CUTOFF_MHZ_2M_SENS = 1.2


def cutoff_for_phy(phy: str) -> float:
    """Default channel-filter cutoff (MHz) for an LE PHY."""
    ch_sps_for_phy(phy)
    return CUTOFF_MHZ_2M if phy == "2m" else CUTOFF_MHZ_1M


def ch_sps_for_phy(phy: str) -> int:
    """Samples per SYMBOL in the 4 Msps channelizer output for an LE
    PHY — 4 at 1M, 2 at 2M (BLE 5 keeps the 2 MHz channel grid, so only
    the symbol rate changes). Owns the phy validation for every wideband
    surface (WidebandConfig, ShardedWidebandScan, selftest)."""
    if phy not in ("1m", "2m"):
        raise ValueError(f"unknown phy {phy!r} (want '1m'|'2m')")
    return 2 if phy == "2m" else CH_SPS


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates"))
def decode_channels(i_ch, q_ch, aa_rows, aa_mask, whiten_rows, crc_inits,
                    adv_flags, sps: int, lag: int, max_candidates: int = 8):
    """vmap of the dense block decoder over the channel axis.

    aa_rows is (M, 32): each channel can search a different access address
    (advertising channels use 0x8E89BED6; data channels of a followed
    connection use the sniffed AA)."""

    def one(i, q, aab, w, c, a):
        return decode_block(i, q, aab, aa_mask, w, c, a,
                            sps=sps, lag=lag, max_candidates=max_candidates)

    return jax.vmap(one)(i_ch, q_ch, aa_rows, whiten_rows, crc_inits, adv_flags)


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates", "num_taps",
                                   "has_context", "cutoff_mhz"))
def wideband_scan(i_wb, q_wb, aa_rows, aa_mask, whiten_rows, crc_inits,
                  adv_flags, sps: int = CH_SPS, lag: int = CH_LAG,
                  max_candidates: int = 8, num_taps: int = DEFAULT_TAPS,
                  has_context: bool = False, cutoff_mhz: float = 1.0):
    """One fused program: 80 Msps block -> 40-channel candidate arrays.
    aa_rows: (M, 32) per-channel access-address bits (or (32,), broadcast)."""
    y_i, y_q = channelize(i_wb, q_wb, num_taps=num_taps, has_context=has_context,
                          cutoff_mhz=cutoff_mhz)
    if aa_rows.ndim == 1:
        aa_rows = jnp.broadcast_to(aa_rows, (M, 32))
    return decode_channels(y_i, y_q, aa_rows, aa_mask, whiten_rows,
                           crc_inits, adv_flags, sps, lag, max_candidates)


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates", "num_taps",
                                   "has_context", "cutoff_mhz"))
def rescan_channel(i_wb, q_wb, slot, aa_row, aa_mask, whiten_row, crc_init,
                   adv_flag, min_pos, sps: int = CH_SPS, lag: int = CH_LAG,
                   max_candidates: int = 8, num_taps: int = DEFAULT_TAPS,
                   has_context: bool = False, cutoff_mhz: float = 1.0):
    """Continue the span-eating scan of ONE channel past ``min_pos``.

    Used when a block has more AA hits in a channel than candidate slots
    (the wideband analog of stream_decode's slot-exhaustion rescan,
    rx/decoder.py): ``slot`` and ``min_pos`` are traced, so every rescan
    reuses one compiled program regardless of channel or cursor."""
    y_i, y_q = channelize(i_wb, q_wb, num_taps=num_taps, has_context=has_context,
                          cutoff_mhz=cutoff_mhz)
    return decode_block(y_i[slot], y_q[slot], aa_row, aa_mask, whiten_row,
                        crc_init, adv_flag, sps=sps, lag=lag,
                        max_candidates=max_candidates, min_pos=min_pos)


def try_track_connection(hop_tracker, pkt, now_us, aa_rows, crc_inits):
    """CONNECT_REQ handling shared by the single-device and sharded
    wideband followers: book the connection with the hop tracker and, iff
    the tracker ACCEPTED it (state 0 -> tracking), return
    (conn, new_aa_rows, new_crc_inits); otherwise None. A later
    CONNECT_REQ while already tracking is ignored, like the reference's
    controller which only consumes receiver_status in state 0
    (btle_rx.c:2414-2457)."""
    from ..ll.hop import ConnectionInfo
    from ..ll.pdu import AdvPduType, parse_adv_header, parse_adv_payload

    if not (pkt.crc_ok and pkt.channel in (37, 38, 39)):
        return None
    try:
        hdr = parse_adv_header(pkt.pdu_bytes[:2])
        if hdr.pdu_type != AdvPduType.CONNECT_REQ:
            return None
        payload = parse_adv_payload(pkt.pdu_bytes[2:], hdr.pdu_type)
    except ValueError:
        return None
    conn = ConnectionInfo(payload.aa, payload.crc_init, payload.hop,
                          payload.interval, payload.chm)
    prev_state = hop_tracker.state
    hop_tracker.on_connect_req(conn, now_us)
    if not (prev_state == 0 and hop_tracker.state != 0):
        return None
    aa_bits = B.hex_to_bits(int(conn.access_addr).to_bytes(4, "little").hex())
    crc_tab = C.crc_init_reorder(conn.crc_init)
    new_aa = np.asarray(aa_rows).copy()
    new_crc = np.asarray(crc_inits).copy()
    for m in range(M):
        if bin_to_channel(m) not in (37, 38, 39):
            new_aa[m] = aa_bits
            new_crc[m] = crc_tab
    return conn, jnp.asarray(new_aa), jnp.asarray(new_crc)


@partial(jax.jit, static_argnames=("fused", "sps", "lag", "max_candidates",
                                   "num_taps", "has_context", "tile",
                                   "compute_dtype", "cutoff_mhz"))
def _scan_and_pack(xi, xq, aa_rows, aa_mask, whiten_rows, crc_inits,
                   adv_flags, *, fused: bool, sps: int, lag: int,
                   max_candidates: int, num_taps: int, has_context: bool,
                   cutoff_mhz: float, tile=None, compute_dtype="bf16x2w"):
    """The streaming sniffer's per-block program: scan + output packing
    fused into ONE compiled program (see WidebandSniffer._pack_outputs)."""
    if fused:
        from .fused import wideband_scan_fused as scan_fn

        out = scan_fn(xi, xq, aa_rows, aa_mask, whiten_rows, crc_inits,
                      adv_flags, sps=sps, lag=lag,
                      max_candidates=max_candidates, num_taps=num_taps,
                      has_context=has_context, tile=tile,
                      compute_dtype=compute_dtype, cutoff_mhz=cutoff_mhz)
    else:
        out = wideband_scan(xi, xq, aa_rows, aa_mask, whiten_rows,
                            crc_inits, adv_flags, sps=sps, lag=lag,
                            max_candidates=max_candidates,
                            num_taps=num_taps, has_context=has_context,
                            cutoff_mhz=cutoff_mhz)
    return WidebandSniffer._pack_outputs(out)


@dataclass
class WidebandConfig:
    access_address_hex: str = ADV_ACCESS_ADDRESS_HEX
    crc_init_hex: str = "555555"
    follow_connections: bool = False  # sniff CONNECT_REQ -> listen on data channels
    # >1: follow up to N connections CONCURRENTLY, each owning the data
    # channel its hop sequence currently occupies (per-channel AA/CRC
    # re-keying; ll.multifollow — beyond the single-radio reference).
    # 1 keeps the reference-parity semantics: the first tracked
    # connection keys EVERY data channel.
    max_follow: int = 1
    # multi-follow only: unregister a connection after K intervals
    # without a CRC-OK packet (None = never, like the reference)
    drop_after_intervals: int | None = None
    max_candidates: int = 16
    scan_len_ch: int = 8192          # per-channel territory (samples @4 Msps)
    num_taps: int = DEFAULT_TAPS  # prototype length (channelizer.DEFAULT_TAPS)
    # per-channel CRC init override for followed connections
    data_crc_init_table: int | None = None
    data_access_address_hex: str | None = None
    # fused Pallas front end (wideband.fused): keeps the channelized
    # baseband in VMEM instead of round-tripping HBM between stages.
    # Off by default (the XLA path runs everywhere incl. CPU); bench.py
    # and TPU deployments turn it on.
    fused: bool = False
    # None = per-dtype measured default (fused._default_tile)
    fused_tile: int | None = None
    # Shipped default "bf16x2w": bf16 hi/lo weight pair + bf16 operands
    # — exact for int8 SDR wire formats, hardware-validated packet-set-
    # identical to the exact mode (tools/validate_fused_tpu.py, the
    # 186-packet soak, KNOBMATRIX.json), 1057-1071 Msps on v5e = the
    # BASELINE config-4 target with ~33% headroom. Deployments should
    # gate a new backend/config with the known-answer selftest
    # (WidebandSniffer.selftest() / `wideband --selftest`; the CLI runs
    # it automatically on TPU backends). Opt-in "f32" is the bit-level
    # parity mode: exact -100 dB filterbank via the stacked true-
    # polyphase "polyx" inner, 806-811 Msps = the 10x-real-time target
    # met in the exact mode too (round 5) — see PERF.md's dynamic-range
    # ladder for the full trade.
    fused_dtype: str = "bf16x2w"
    # LE PHY of the airspace ("1m" | "2m"). 2M rides the SAME 2 MHz
    # channel grid (BLE 5 keeps the channel plan), so the channelizer is
    # unchanged and the per-channel 4 Msps stream simply carries 2
    # samples/symbol (sps=2, symbol lag 2). The default prototype
    # truncates the 2M spectrum's edges (interference-robust; the
    # sensitivity-optimized CUTOFF_MHZ_2M_SENS recovers ~1 dB of AWGN
    # floor at the cost of adjacent-channel rejection — see the cutoff
    # note above and BER_CURVES.md) — beyond the LE-1M-only reference
    # either way.
    phy: str = "1m"
    # channel-filter passband (MHz); None = per-phy default
    # (cutoff_for_phy: 1.0 at 1M, 1.3 at 2M — the phy-aware prototype)
    cutoff_mhz: float | None = None

    def __post_init__(self):
        ch_sps_for_phy(self.phy)   # validates

    @property
    def resolved_cutoff_mhz(self) -> float:
        return (self.cutoff_mhz if self.cutoff_mhz is not None
                else cutoff_for_phy(self.phy))


@dataclass
class WidebandPacket:
    channel: int
    sample_pos: int                  # absolute per-channel sample index
    payload_len: int
    crc_ok: bool
    pdu_bytes: np.ndarray
    rssi_mag: float
    header: object | None = None
    payload: object | None = None
    # the access address whose correlator row decoded this packet (the
    # channel's key at decode time — under multi-follow different data
    # channels carry different connections' AAs)
    access_addr: int = 0x8E89BED6


def default_scan_tables():
    """Standard advertising-scan tables for the 40-bin wideband scan:
    (aa_bits (32,), aa_mask (32,), whiten_rows (40, 336),
    crc_inits (40,), adv_flags (40,)) — the BLE defaults (ADV access
    address, all-care mask, per-channel whitening, 0x555555 CRC init,
    adv flags on 37/38/39). One definition shared by bench.py,
    tools/bench_latency.py and wideband.selftest; WidebandSniffer builds
    config-dependent variants (custom AA / CRC init / data-channel
    re-key) itself."""
    aa_bits = jnp.asarray(B.hex_to_bits("d6be898e"))
    aa_mask = jnp.asarray(np.ones(32, np.int8))
    whiten_rows = jnp.asarray(np.stack(
        [W.whitening_bits(bin_to_channel(m), 336) for m in range(M)]))
    crc_inits = jnp.asarray(
        np.full(M, C.lfsr_init_to_table_init("555555"), np.int32))
    adv_flags = jnp.asarray(
        np.array([bin_to_channel(m) in (37, 38, 39) for m in range(M)]))
    return aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags


class WidebandSniffer:
    """Streaming 40-channel sniffer over wideband blocks."""

    def __init__(self, cfg: WidebandConfig | None = None):
        self.cfg = cfg or WidebandConfig()
        cfg = self.cfg
        aa_adv = B.hex_to_bits(cfg.access_address_hex)
        self.aa_rows = jnp.asarray(np.tile(aa_adv, (M, 1)))
        self.aa_mask = jnp.asarray(np.ones(32, np.int8))
        whiten_rows = np.stack(
            [W.whitening_bits(bin_to_channel(m), 336) for m in range(M)]
        )
        self.whiten_rows = jnp.asarray(whiten_rows)
        adv_flags = np.array(
            [bin_to_channel(m) in (37, 38, 39) for m in range(M)]
        )
        self.adv_flags = jnp.asarray(adv_flags)
        crc_adv = C.lfsr_init_to_table_init(cfg.crc_init_hex)
        crc_data = cfg.data_crc_init_table if cfg.data_crc_init_table is not None else crc_adv
        self.crc_inits = jnp.asarray(
            np.where(adv_flags, crc_adv, crc_data).astype(np.int32)
        )
        self._cursors = np.zeros(M, dtype=np.int64)   # per-channel span-eating
        self._offset_ch = 0                           # per-channel sample offset
        # samples per SYMBOL in the 4 Msps channel stream (4 at LE 1M,
        # 2 at LE 2M); time conversions keep CH_SPS = samples per US
        self._sps = ch_sps_for_phy(cfg.phy)
        self._lag = self._sps                         # symbol-lag decisions
        self.halo_ch = required_halo(self._sps, self._lag)
        # left context: real history samples fed to the channelizer so
        # packets starting right at a block boundary see no filter warm-up
        self._ctx_len = self.cfg.num_taps - 1
        self._ctx_i = np.zeros(self._ctx_len, np.float32)
        self._ctx_q = np.zeros(self._ctx_len, np.float32)
        self.truncated_channels = 0   # candidate-capacity overflows seen
        self._shapes_cache = None     # packed-output layout (per config)
        # connection following: hop-pattern tracker + device-array updates.
        # Unlike the single-radio reference, the wideband sniffer hears all
        # 37 data channels at once — tracking a connection only means
        # swapping the AA/CRC-init rows; no retuning, no missed dwells.
        from ..ll.hop import HopTracker
        from ..ll.multifollow import MultiConnectionFollower

        self.hop_tracker = None
        self.multi_follower = None
        self._aa_np = None          # per-block snapshot of aa_rows
        if self.cfg.follow_connections:
            if self.cfg.max_follow > 1:
                self.multi_follower = MultiConnectionFollower(
                    np.asarray(self.aa_rows), np.asarray(self.crc_inits),
                    max_connections=self.cfg.max_follow,
                    drop_after_intervals=self.cfg.drop_after_intervals)
            else:
                self.hop_tracker = HopTracker()
        self.connection = None

    @property
    def wb_block_len(self) -> int:
        """Wideband samples to feed per process() call."""
        return (self.cfg.scan_len_ch + self.halo_ch) * D

    def apply_control_registers(self, writes):
        """Live re-key from a stream.control.ControlServer: the AA / CRC
        registers (ble_send_cmd.c:340-363) re-key every DATA channel —
        the wideband receiver hears all 40 channels at once, so the
        reference's channel-retune register is a no-op here."""
        from ..stream.control import REG_ACCESS_ADDR, REG_CRC_INIT

        aa_rows = np.asarray(self.aa_rows).copy()
        crc_rows = np.asarray(self.crc_inits).copy()
        adv = np.asarray(self.adv_flags)
        for idx, val in writes:
            if idx == REG_ACCESS_ADDR:
                bits = B.hex_to_bits(int(val).to_bytes(4, "little").hex())
                aa_rows[~adv] = bits
            elif idx == REG_CRC_INIT:
                crc_rows[~adv] = C.crc_init_reorder(int(val))
        self.aa_rows = jnp.asarray(aa_rows)
        self.crc_inits = jnp.asarray(crc_rows)

    def selftest(self) -> dict:
        """Known-answer self-test of EXACTLY this sniffer's pipeline and
        kernel configuration on the attached backend (wideband.selftest).
        Run once per deployment / backend / config change before a long
        capture — a miscompiled kernel can run fine and decode nothing.
        Raises WidebandSelfTestError on failure; returns the decoded
        {channel: position} map on success."""
        from .selftest import fused_selftest

        if self.cfg.fused:
            return fused_selftest(compute_dtype=self.cfg.fused_dtype,
                                  tile=self.cfg.fused_tile,
                                  phy=self.cfg.phy)
        return fused_selftest(pipeline="xla", phy=self.cfg.phy)

    # fixed key order for the single-fetch output packing (below)
    _PACK_KEYS = ("pos", "valid", "payload_len", "len_ok", "crc_ok",
                  "pdu_bytes", "mag_mean", "num_hits")

    def _scan_kwargs(self) -> dict:
        return dict(sps=self._sps, lag=self._lag,
                    max_candidates=self.cfg.max_candidates,
                    num_taps=self.cfg.num_taps, has_context=True,
                    cutoff_mhz=self.cfg.resolved_cutoff_mhz)

    @staticmethod
    @jax.jit
    def _pack_outputs(out):
        """Flatten the whole candidate tree into ONE int32 vector on
        device. Through a remote device link every np.asarray is a
        ~25 ms round trip — eight per block made the live loop fetch-
        bound at ~5x air time; one packed fetch restores it (floats ride
        as bit patterns)."""
        segs = []
        for k in WidebandSniffer._PACK_KEYS:
            v = out[k]
            v32 = (jax.lax.bitcast_convert_type(v, jnp.int32)
                   if v.dtype == jnp.float32 else v.astype(jnp.int32))
            segs.append(v32.reshape(-1))
        return jnp.concatenate(segs)

    @staticmethod
    def _unpack_outputs(buf, shapes_dtypes):
        out = {}
        off = 0
        for k, (shape, dtype) in shapes_dtypes.items():
            n = int(np.prod(shape))
            v = buf[off : off + n].reshape(shape)
            if dtype == np.float32:
                v = v.view(np.float32)
            elif dtype == np.bool_:
                v = v.astype(bool)
            out[k] = v
            off += n
        return out

    def process(self, i_wb, q_wb) -> list[WidebandPacket]:
        """Process one wideband block of wb_block_len samples. Successive
        calls must overlap by halo_ch*D wideband samples (the stream
        helper below handles this); filter history is carried internally."""
        return self.consume_scan(self.scan_async(i_wb, q_wb))

    def scan_async(self, i_wb, q_wb):
        """Dispatch the device scan of one block WITHOUT fetching results.

        Returns an opaque handle for consume_scan(). Splitting the two
        lets a live loop pipeline: dispatch block k, then consume block
        k-1 while k computes — the host result fetch (the dominant
        per-block cost through a remote device link) hides behind the
        next block's device time. Handles MUST be consumed in dispatch
        order (the span-eating cursors advance per block); follow
        re-keying then lags the pipeline depth, the same latency class
        as the reference's serial half-buffer loop (btle_rx.c:531-540).
        """
        # integer wire formats stay integer on the host->device link
        # (the cast runs on device): halves the per-block upload for the
        # int16 live path vs a host-side float conversion
        i_wb = np.asarray(i_wb)
        q_wb = np.asarray(q_wb)
        if i_wb.dtype.kind not in "iu":
            i_wb = i_wb.astype(np.float32)
            q_wb = q_wb.astype(np.float32)
        if self._ctx_i.dtype != i_wb.dtype:
            self._ctx_i = self._ctx_i.astype(i_wb.dtype)
            self._ctx_q = self._ctx_q.astype(i_wb.dtype)
        xi = np.concatenate([self._ctx_i, i_wb])
        xq = np.concatenate([self._ctx_q, q_wb])
        # next block starts right after this block's territory; xi already
        # holds ctx+block, so the new context is simply the ctx_len samples
        # ending at the territory boundary
        step = self.cfg.scan_len_ch * D
        self._ctx_i = xi[step : step + self._ctx_len].copy()
        self._ctx_q = xq[step : step + self._ctx_len].copy()
        dxi, dxq = jnp.asarray(xi), jnp.asarray(xq)
        kw = self._scan_kwargs()
        if self.cfg.fused:
            kw.update(tile=self.cfg.fused_tile,
                      compute_dtype=self.cfg.fused_dtype)
        args = (dxi, dxq, self.aa_rows, self.aa_mask, self.whiten_rows,
                self.crc_inits, self.adv_flags)
        # ONE dispatched program: the scan with the output tree packed
        # into a single int32 vector — one device program per block and
        # one host fetch per consume (every extra program/fetch is a
        # ~25 ms round trip through a remote device link)
        cache_key = (dxi.shape, str(dxi.dtype))
        if self._shapes_cache is None or self._shapes_cache[0] != cache_key:
            # keyed by input shape/dtype: a caller may feed blocks of a
            # different length than wb_block_len (run() pads, but the
            # API does not require it)
            if self.cfg.fused:
                from .fused import wideband_scan_fused as _sf
            else:
                _sf = wideband_scan
            out_sh = jax.eval_shape(partial(_sf, **kw), *args)
            self._shapes_cache = (cache_key,
                                  {k: (out_sh[k].shape,
                                       np.dtype(out_sh[k].dtype))
                                   for k in self._PACK_KEYS})
        packed = _scan_and_pack(*args, fused=self.cfg.fused, **kw)
        shapes_dtypes = self._shapes_cache[1]
        # snapshot the keys THIS scan used (follow handling may re-key
        # self.aa_rows for later blocks while this one is in flight)
        return {"packed": packed, "shapes": shapes_dtypes,
                "dxi": dxi, "dxq": dxq,
                "aa_np": np.asarray(self.aa_rows),
                "aa_rows": self.aa_rows, "crc_inits": self.crc_inits}

    def consume_scan(self, handle) -> list[WidebandPacket]:
        """Fetch + walk one scan_async() handle (in dispatch order)."""
        out = self._unpack_outputs(np.asarray(handle["packed"]),
                                   handle["shapes"])
        dxi, dxq = handle["dxi"], handle["dxq"]
        self._aa_np = handle["aa_np"]

        packets: list[WidebandPacket] = []
        scan_limit = self.cfg.scan_len_ch
        for m in range(M):
            row = {k: v[m] for k, v in out.items()}
            exhausted = self._consume_channel(m, row, scan_limit, packets)
            # slot exhaustion: hits past the last slot were not decoded —
            # continue this channel's scan from the consumed cursor (same
            # compiled program each time; slot/min_pos are traced)
            while exhausted and self._cursors[m] - self._offset_ch < scan_limit:
                before = self._cursors[m]
                self.truncated_channels += 1
                more = rescan_channel(
                    dxi, dxq, jnp.int32(m),
                    handle["aa_rows"][m], self.aa_mask,
                    self.whiten_rows[m], handle["crc_inits"][m],
                    self.adv_flags[m],
                    jnp.int32(self._cursors[m] - self._offset_ch),
                    sps=self._sps, lag=self._lag,
                    max_candidates=self.cfg.max_candidates,
                    num_taps=self.cfg.num_taps, has_context=True,
                    cutoff_mhz=self.cfg.resolved_cutoff_mhz,
                )
                more = {k: np.asarray(v) for k, v in more.items()}
                exhausted = self._consume_channel(m, more, scan_limit, packets)
                if self._cursors[m] == before:
                    # remaining hits are all in the halo: the next block's
                    # scan owns them
                    break
        self._offset_ch += scan_limit
        if self.hop_tracker is not None:
            self.hop_tracker.on_tick(self._offset_ch // CH_SPS)
        if self.multi_follower is not None:
            # connections hop on their interval clocks — re-key each
            # connection's newly-occupied channel for the next block
            if self.multi_follower.on_tick(self._offset_ch // CH_SPS):
                self._apply_follow_tables()
        return packets

    def _channel_aa(self, m: int) -> int:
        """The access address currently keying channel bin m (the value
        a pcap PHDR should carry for packets decoded there)."""
        if self._aa_np is None:
            self._aa_np = np.asarray(self.aa_rows)
        return int.from_bytes(
            B.bits_to_bytes(self._aa_np[m]).tobytes(), "little")

    def _consume_channel(self, m: int, row: dict, scan_limit: int,
                         packets: list[WidebandPacket]) -> bool:
        """Walk one channel's candidate slots in stream order, appending
        packets and advancing the span-eating cursor. Returns True when
        every slot was filled AND more hits exist past them (the caller
        should rescan from the cursor)."""
        ch = bin_to_channel(m)
        adv = ch in (37, 38, 39)
        pos, valid = row["pos"], row["valid"]
        for k in range(len(pos)):
            if not valid[k]:
                return False
            p = int(pos[k])
            abs_p = self._offset_ch + p
            if p >= scan_limit or abs_p < self._cursors[m]:
                continue
            if adv and not row["len_ok"][k]:
                self._cursors[m] = abs_p + (32 + 16) * self._sps
                continue
            pl = int(row["payload_len"][k])
            pkt = WidebandPacket(
                ch, abs_p, pl, bool(row["crc_ok"][k]),
                row["pdu_bytes"][k, : 2 + pl].astype(np.uint8),
                float(row["mag_mean"][k]),
                access_addr=self._channel_aa(m),
            )
            self._attach_parse(pkt, adv)
            self._maybe_follow(pkt, adv)
            packets.append(pkt)
            self._cursors[m] = abs_p + (32 + 16 + (pl + 3) * 8) * self._sps
        return int(row["num_hits"]) > len(pos)

    def _maybe_follow(self, pkt: WidebandPacket, adv: bool):
        """CONNECT_REQ handling + hop bookkeeping (follow_connections)."""
        now_us = pkt.sample_pos // CH_SPS
        if self.multi_follower is not None:
            if self.multi_follower.on_packet(pkt, adv, now_us):
                self._apply_follow_tables()
            return
        if self.hop_tracker is None:
            return
        if adv:
            res = try_track_connection(self.hop_tracker, pkt, now_us,
                                       self.aa_rows, self.crc_inits)
            if res is not None:
                self.connection, self.aa_rows, self.crc_inits = res
        elif pkt.crc_ok:
            self.hop_tracker.on_crc_ok_packet(now_us)
            ctrl = getattr(pkt.payload, "ctrl", None)
            if ctrl is not None:
                # apply sniffed map/interval updates (ll.hop.on_ll_ctrl)
                self.hop_tracker.on_ll_ctrl(ctrl.opcode, ctrl.fields, now_us)

    def _apply_follow_tables(self):
        aa_rows, crc = self.multi_follower.tables()
        self.aa_rows = jnp.asarray(aa_rows)
        self.crc_inits = jnp.asarray(crc)

    def _attach_parse(self, pkt: WidebandPacket, adv: bool):
        try:
            if adv:
                pkt.header = parse_adv_header(pkt.pdu_bytes[:2])
                pkt.payload = parse_adv_payload(pkt.pdu_bytes[2:], pkt.header.pdu_type)
            else:
                pkt.header = parse_ll_header(pkt.pdu_bytes[:2])
                pkt.payload = parse_ll_payload(pkt.pdu_bytes[2:], pkt.header.llid)
        except ValueError:
            pkt.payload = None

    def run(self, i_wb: np.ndarray, q_wb: np.ndarray) -> list[WidebandPacket]:
        """Convenience: scan a whole in-memory wideband capture."""
        step_wb = self.cfg.scan_len_ch * D
        total = self.wb_block_len
        packets = []
        for s in range(0, max(1, len(i_wb)), step_wb):
            blk_i = np.zeros(total, dtype=np.float32)
            blk_q = np.zeros(total, dtype=np.float32)
            seg_i = i_wb[s : s + total]
            blk_i[: len(seg_i)] = seg_i
            seg_q = q_wb[s : s + total]
            blk_q[: len(seg_q)] = seg_q
            packets.extend(self.process(blk_i, blk_q))
            if s + total >= len(i_wb):
                break
        return packets
