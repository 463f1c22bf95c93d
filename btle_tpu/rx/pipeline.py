"""Dense TPU receive pipeline: demod -> AA correlate -> dewhiten -> CRC.

Design (vs the reference's sample-serial scan, btle_rx.c:2188-2391 and
btlelib.py:414-541): everything is computed densely over a fixed-shape IQ
block with no data-dependent control flow, so XLA compiles one fused
program per block shape:

  1. phase-difference decisions over the full-rate lattice (VPU),
  2. access-address correlation as a 32-tap symbol-dilated convolution,
  3. top-K earliest hit positions (sort of a masked iota),
  4. per-candidate (vmap) gather of the max-length packet bit window,
     XOR de-whitening, byte packing via a bits->bytes dot,
  5. CRC24 prefix scan over all 42 candidate bytes with the verdict
     selected at the data-dependent payload length — variable-length
     packets without recompilation or early exit.

The early-exit/first-hit semantics of the reference are reproduced by the
host-side decoder (btle_tpu.rx.decoder) on top of these dense results.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phy.demodulator import aa_match_counts, decisions
from ..spec.constants import MAX_PDU_CRC_BITS, MAX_PDU_CRC_BYTE
from ..spec.crc24 import CRC24_TABLE

AA_BITS = 32
_BYTE_WEIGHTS = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.int32)


def required_halo(sps: int, lag: int) -> int:
    """Samples needed beyond a hit position to decode a max-length packet."""
    return (AA_BITS + MAX_PDU_CRC_BITS) * sps + lag


@partial(jax.jit, static_argnames=("sps", "lag"))
def scan_block(i, q, aa_bits, aa_mask, sps: int, lag: int):
    """(hit_mask, bit_lattice) for one IQ block.

    hit_mask[n] is True iff an access address starts at full-rate lattice
    position n (all unmasked AA bits match with symbol stride sps).
    """
    bits = decisions(i, q, lag)
    counts = aa_match_counts(bits, aa_bits, aa_mask, sps)
    n_mask = jnp.sum(aa_mask.astype(jnp.int32))
    return counts == n_mask, bits


from ..spec.crc24 import linear_crc_matrices

_CRC_V, _CRC_MINIT = linear_crc_matrices(MAX_PDU_CRC_BYTE)
_STATE_WEIGHTS = (2.0 ** np.arange(24)).astype(np.float32)


def _decode_candidate(pos, bits, whiten, crc_init, adv_flag, table, sps):
    """Decode one candidate AA hit at lattice position ``pos``.

    Returns (plen, crc_match, pdu_bytes[42], len_ok, dew_bits[336]).
    ``crc_match`` is the raw CRC comparison at the clamped length; callers
    combine it with len_ok/validity as their semantics require (the C tool
    gates on ADV length, the golden model does not).

    The CRC prefix states use the GF(2)-linear form of the reference's
    table update (btle_rx.c:1211-1222): all 42 prefix states are one
    0/1 matrix product, so a vmap over candidates lowers to a single MXU
    matmul instead of a 42-step scan of per-lane table gathers.
    ``table`` is unused (kept for call-site stability).
    """
    m = bits.shape[0]
    idx = pos + AA_BITS * sps + jnp.arange(MAX_PDU_CRC_BITS, dtype=jnp.int32) * sps
    raw = jnp.take(bits, jnp.clip(idx, 0, m - 1))
    dew = jnp.bitwise_xor(raw.astype(jnp.int32), whiten.astype(jnp.int32))
    pkt_bytes = jnp.dot(
        dew.reshape(MAX_PDU_CRC_BYTE, 8).astype(jnp.float32),
        jnp.asarray(_BYTE_WEIGHTS, jnp.float32),
    ).astype(jnp.int32)

    plen6 = jnp.dot(dew[8:14].astype(jnp.int32), jnp.asarray(_BYTE_WEIGHTS[:6]))
    plen5 = jnp.dot(dew[8:13].astype(jnp.int32), jnp.asarray(_BYTE_WEIGHTS[:5]))
    plen = jnp.where(adv_flag, plen6, plen5)
    # ADV payload must be 6..37 (btle_rx.c:2293); data-channel max 31 by field width
    len_ok = jnp.where(adv_flag, (plen >= 6) & (plen <= 37), plen <= 31)
    plen_c = jnp.clip(plen, 0, 37)

    # parity counts are <= 360 so f32 accumulation is exact
    contrib = jnp.dot(dew.astype(jnp.float32), jnp.asarray(_CRC_V))
    init_bits = ((crc_init >> jnp.arange(24)) & 1).astype(jnp.float32)
    init_contrib = jnp.dot(init_bits, jnp.asarray(_CRC_MINIT))
    state_bits = (contrib + init_contrib).astype(jnp.int32) & 1
    states = jnp.dot(
        state_bits.reshape(MAX_PDU_CRC_BYTE, 24).astype(jnp.float32),
        jnp.asarray(_STATE_WEIGHTS),
    ).astype(jnp.int32)          # states[k] = CRC after bytes 0..k
    crc_state = states[plen_c + 1]  # after header(2) + payload(plen) bytes
    crc_rcv = (
        pkt_bytes[plen_c + 2]
        + pkt_bytes[plen_c + 3] * 256
        + pkt_bytes[plen_c + 4] * 65536
    )
    crc_match = crc_state == crc_rcv
    return plen, crc_match, pkt_bytes, len_ok, dew


def earliest_hits(hit, max_candidates: int, min_pos):
    """Earliest ``max_candidates`` hit positions of a 0/1 hit lattice, in
    stream order, ignoring positions before ``min_pos`` (traced).

    Returns (pos, valid, num_hits). Selection is hierarchical: segment
    minima of the masked iota, top_k over the ~N/128 segments, then an
    exact top_k over the K selected segments' entries. Correct because
    any segment containing one of the K earliest hits has a minimum no
    larger than that hit, so it ranks among the K smallest segment
    minima. A flat top_k over the full lattice costs ~5x more
    (measured); the round-1 cumsum-rank + scatter cost ~30 ms/block.
    """
    npos = hit.shape[0]
    hit = hit & (jnp.arange(npos, dtype=jnp.int32) >= jnp.int32(min_pos))
    big = jnp.int32(np.iinfo(np.int32).max // 2)
    masked = jnp.where(hit, jnp.arange(npos, dtype=jnp.int32), big)

    seg = 128
    n_segs = -(-npos // seg)
    k_seg = min(max_candidates, n_segs)
    if k_seg < n_segs:
        m2 = jnp.pad(masked, (0, n_segs * seg - npos),
                     constant_values=big).reshape(n_segs, seg)
        _, seg_idx = jax.lax.top_k(-jnp.min(m2, axis=1), k_seg)
        flat = m2[seg_idx].reshape(-1)
    else:
        flat = masked
    neg_top, _ = jax.lax.top_k(-flat, max_candidates)
    top = -neg_top
    valid = top < big
    pos = jnp.where(valid, top, 0)
    return pos, valid, jnp.sum(hit.astype(jnp.int32))


@partial(jax.jit, static_argnames=("sps", "max_candidates"))
def decode_from_lattice(hit, bits, mag_win, whiten, crc_init, adv_flag,
                        sps: int, max_candidates: int = 16, min_pos=0):
    """Candidate selection + CRC decode over precomputed lattices.

    The same back half as decode_block, but taking the (hit, bits) lattices
    and a per-position RSSI window mean directly — the fused Pallas
    front-end (wideband.fused) produces these without materializing the
    per-channel IQ in HBM. Output dict matches decode_block.
    """
    pos, valid, num_hits = earliest_hits(hit, max_candidates, min_pos)
    table = jnp.asarray(CRC24_TABLE.astype(np.int32))
    plen, crc_match, pkt_bytes, len_ok, _ = jax.vmap(
        lambda p: _decode_candidate(p, bits, whiten, crc_init, adv_flag, table, sps)
    )(pos)
    crc_ok = crc_match & len_ok
    mag_mean = jnp.take(mag_win, jnp.clip(pos, 0, mag_win.shape[0] - 1))
    return {
        "pos": pos,
        "valid": valid,
        "payload_len": plen,
        "len_ok": len_ok,
        "crc_ok": crc_ok & valid,
        "pdu_bytes": pkt_bytes,
        "mag_mean": mag_mean,
        "num_hits": num_hits,
    }


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates", "with_mag"))
def decode_block(
    i,
    q,
    aa_bits,
    aa_mask,
    whiten,
    crc_init,
    adv_flag,
    sps: int,
    lag: int,
    max_candidates: int = 16,
    with_mag: bool = True,
    min_pos=0,
):
    """Fully dense block decode. Returns a dict of per-candidate arrays
    (earliest ``max_candidates`` AA hits) plus the total hit count.

    i, q:      (N,) int8/int16 IQ block
    aa_bits:   (32,) 0/1 over-the-air access-address bits
    aa_mask:   (32,) 0/1 per-bit care mask (--access_mask, btle_rx.c:1510)
    whiten:    (336,) whitening bit sequence for the channel
    crc_init:  int32 table-form CRC init
    adv_flag:  bool scalar — advertising (6-bit length) vs data channel
    """
    hit, bits = scan_block(i, q, aa_bits, aa_mask, sps, lag)
    # ``min_pos`` (traced) lets callers continue a span-eating scan past
    # the first max_candidates hits without recompiling
    pos, valid, num_hits = earliest_hits(hit, max_candidates, min_pos)

    table = jnp.asarray(CRC24_TABLE.astype(np.int32))
    plen, crc_match, pkt_bytes, len_ok, _ = jax.vmap(
        lambda p: _decode_candidate(p, bits, whiten, crc_init, adv_flag, table, sps)
    )(pos)
    crc_ok = crc_match & len_ok

    # RSSI statistic: mean(|I|+|Q|) over the 32-symbol AA window
    # (btle_rx.c:2234-2252). Converted to dBm-ish on the host; skippable
    # (the cumsum over the whole block is not free when RSSI is unused).
    if with_mag:
        win = AA_BITS * sps
        mag = jnp.abs(i.astype(jnp.int32)) + jnp.abs(q.astype(jnp.int32))
        cmag = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(mag)])
        upper = jnp.clip(pos + win, 0, mag.shape[0])
        mag_mean = (cmag[upper] - cmag[pos]).astype(jnp.float32) / jnp.float32(win)
    else:
        mag_mean = jnp.zeros(max_candidates, jnp.float32)

    return {
        "pos": pos,
        "valid": valid,
        "payload_len": plen,
        "len_ok": len_ok,
        "crc_ok": crc_ok & valid,
        "pdu_bytes": pkt_bytes,
        "mag_mean": mag_mean,
        "num_hits": num_hits,
    }


def rssi_dbm_from_mag(mag_mean: float) -> int:
    """Reference RSSI mapping (btle_rx.c:2246-2251)."""
    mean = max(float(mag_mean), 1.0)
    v = int(20.0 * np.log10(mean / 256.0) - 50.0)
    return max(-127, min(20, v))
