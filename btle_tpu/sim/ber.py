"""Batched BER sweeps: the whole Monte-Carlo loop as one device program.

The reference harness (python/test_btle_ber.py:26-80) runs 100-300 packets
serially through TX -> ppm -> AWGN -> RX per SNR point. Here the packet
batch is a single vmapped program: modulate, impair, and decode hundreds of
packets at once, with the golden model's per-phase first-CRC-OK selection
(btlelib.py:459-518) reproduced densely inside jit (no early exit — all
phases decode, a masked argmax picks the winner).

Error accounting matches the reference (test_btle_ber.py:62-72): a packet
that decodes CRC-OK contributes zero errors; a failed packet contributes
the mismatch count over min(len(tx), len(rx)) PDU bits, or the full packet
length when no access address was found.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phy.demodulator import aa_match_counts, decisions
from ..phy.modulator import modulate_python
from ..rx.pipeline import _decode_candidate
from ..spec import bits as B
from ..spec import crc24 as C
from ..spec import whitening as W
from ..spec.constants import MAX_PDU_CRC_BITS
from .channel import apply_ppm, awgn, quantize_int16

# The reference BER packet: max-length ADV payload (test_btle_ber.py:27)
BER_PDU_HEX = "422506050403020119095344522f426c7565746f6f74682f4c6f772f456e657267791234567890"


@partial(jax.jit, static_argnames=("sps",))
def golden_rx_dense(i, q, aa_bits, whiten, crc_init, adv_flag, sps: int):
    """Dense in-jit equivalent of btlelib.btle_rx phase selection.

    Returns (found, crc_ok, payload_len, pdu_bits[336]) for the phase the
    reference would have selected: first CRC-OK phase, else the last phase
    with an AA hit.
    """
    n = i.shape[0]
    bits = decisions(i, q, sps)
    counts = aa_match_counts(bits, aa_bits, jnp.ones(32, jnp.int8), sps)
    hit = counts == 32
    num_bit = int(round(n / sps)) - 1
    mhit = hit.shape[0]

    ks = jnp.arange(num_bit, dtype=jnp.int32)

    def per_phase(p):
        lat = p + ks * sps
        hp = jnp.where(lat < mhit, jnp.take(hit, jnp.clip(lat, 0, mhit - 1)), False)
        found = jnp.any(hp)
        first_k = jnp.argmax(hp)
        pos = p + first_k * sps
        table = jnp.asarray(C.CRC24_TABLE.astype(np.int32))
        # golden model semantics: CRC at the clamped length, NO ADV
        # length gating (btlelib.py:477-497) — so len_ok is ignored here
        plen, crc_match, _, _, dew = _decode_candidate(
            pos, bits, whiten, crc_init, adv_flag, table, sps
        )
        return found, found & crc_match, jnp.clip(plen, 0, 37), dew

    found_p, ok_p, plen_p, dew_p = jax.vmap(per_phase)(jnp.arange(sps, dtype=jnp.int32))

    any_ok = jnp.any(ok_p)
    first_ok = jnp.argmax(ok_p)
    any_found = jnp.any(found_p)
    last_found = sps - 1 - jnp.argmax(found_p[::-1])
    sel = jnp.where(any_ok, first_ok, last_found)
    return (
        any_found,
        ok_p[sel],
        plen_p[sel],
        dew_p[sel],
    )


class BerHarness:
    """Batched Monte-Carlo BER runner (config 3 of BASELINE.json)."""

    def __init__(self, sps: int = 8, channel: int = 37, phy: str = "1m"):
        """sps = samples per SYMBOL (8 -> 8 Msps at 1M, 16 Msps at 2M).
        phy="2m" frames packets with the LE 2M 16-bit preamble
        (beyond-reference: the C harness is 1M-only); the GFSK math is
        rate-invariant at fixed samples/symbol, so 2M anchors match 1M
        within Monte-Carlo spread — the table pins the 16-bit framing
        and AA search under noise, while the CHANNELIZED 2M penalty is
        measured separately (tools/ber_2m_wideband.py).
        """
        if phy not in ("1m", "2m"):
            raise ValueError(f"unknown phy {phy!r}")
        self.phy = phy
        self.sps = sps
        self.channel = channel
        self.aa_bits = jnp.asarray(B.hex_to_bits("d6be898e"))
        self.whiten = jnp.asarray(W.whitening_bits(channel, MAX_PDU_CRC_BITS))
        self.crc_init = jnp.int32(C.lfsr_init_to_table_init("555555"))

        sps_ = self.sps

        @partial(jax.jit, static_argnames=())
        def run_batch(keys, phy_bits, pdu_bits, snr_db, ppm):
            def one(key, phy, pdu):
                i8, q8 = modulate_python(phy, sps=sps_)
                i1, q1 = apply_ppm(i8, q8, ppm, sps_)
                i2, q2 = awgn(key, i1, q1, snr_db)
                i3, q3 = quantize_int16(i2, q2)
                found, crc_ok, plen, dew = golden_rx_dense(
                    i3, q3, self.aa_bits, self.whiten, self.crc_init,
                    jnp.asarray(True), sps_,
                )
                lpdu = pdu.shape[0]
                rx_len_bits = 16 + plen * 8
                jj = jnp.arange(lpdu, dtype=jnp.int32)
                mism = jnp.sum(
                    jnp.where(jj < rx_len_bits, dew[:lpdu] != pdu, False)
                )
                errors = jnp.where(crc_ok, 0, jnp.where(found, mism, lpdu))
                return errors, crc_ok

            errs, oks = jax.vmap(one)(keys, phy_bits, pdu_bits)
            return jnp.sum(errs), jnp.sum(oks.astype(jnp.int32))

        self._run_batch = run_batch

    def make_packets(self, num_packets: int, rng: np.random.Generator):
        """Random max-length ADV packets a la test_btle_ber.py:48-49.

        Assembly (CRC24 + whitening) is batch-vectorized in NumPy — the
        byte-table CRC runs as 39 vector steps over the whole batch instead
        of a per-packet bit-LFSR loop (host assembly used to dominate the
        per-point time)."""
        base = B.hex_to_bits(BER_PDU_HEX)
        pdus = np.tile(base, (num_packets, 1)).astype(np.int8)
        pdus[:, 16:] = rng.integers(0, 2, (num_packets, len(base) - 16), dtype=np.int8)

        # preamble (16 symbols at 2M, by-AA-LSB alternation) + AA
        head = B.hex_to_bits("aaaad6be898e" if self.phy == "2m"
                             else "aad6be898e")
        pdu_bytes = np.packbits(pdus.astype(np.uint8), axis=1, bitorder="little")
        state = np.full(num_packets, C.lfsr_init_to_table_init("555555"), np.int64)
        table = C.CRC24_TABLE.astype(np.int64)
        for k in range(pdu_bytes.shape[1]):
            state = table[(state ^ pdu_bytes[:, k]) & 0xFF] ^ (state >> 8)
        crc_bits = ((state[:, None] >> np.arange(24)) & 1).astype(np.int8)

        body = np.concatenate([pdus, crc_bits], axis=1)
        body ^= W.whitening_bits(self.channel, body.shape[1])
        phys = np.concatenate(
            [np.tile(head, (num_packets, 1)), body], axis=1
        ).astype(np.int8)
        return jnp.asarray(phys), jnp.asarray(pdus)

    BATCH = 100  # fixed vmap width -> one compilation for any sweep size

    def ber_point(self, snr_db: float, ppm: float, num_packets: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        total_err = 0
        total_ok = 0
        nbits = 0
        remaining = num_packets
        batch_idx = 0
        while remaining > 0:
            n = min(self.BATCH, remaining)
            phys, pdus = self.make_packets(self.BATCH, rng)
            keys = jax.random.split(
                jax.random.PRNGKey(seed + 7919 * batch_idx), self.BATCH)
            if n < self.BATCH:
                # run full batch but only count the first n lanes via rerun
                # of the counting below; simpler: accept the extra lanes
                # (statistics only improve)
                n = self.BATCH
            err, ok = self._run_batch(
                keys, phys, pdus, jnp.float32(snr_db), jnp.float32(ppm))
            total_err += int(err)
            total_ok += int(ok)
            nbits += n * pdus.shape[1]
            remaining -= n
            batch_idx += 1
        return total_err / nbits, total_ok, nbits

    def sweep(self, snr_list, ppm: float, num_packets: int, seed: int = 0):
        return [self.ber_point(s, ppm, num_packets, seed + k) for k, s in enumerate(snr_list)]


# reference ppm -> usable max-SNR anchors (test_btle_ber.py:29-30)
PPM_ANCHORS = np.array([0, 10, 20, 25, 30, 35, 40, 45, 50], dtype=np.float64)
SNR_ANCHORS = np.array([11, 12, 13, 14, 15, 17, 19, 21, 26], dtype=np.float64)


def reference_max_snr(ppm: float) -> float:
    return float(np.interp(abs(ppm), PPM_ANCHORS, SNR_ANCHORS))
