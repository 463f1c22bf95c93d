"""LE Coded PHY receiver: coded-AA sync, soft pattern demap, Viterbi.

Beyond-reference (the C tool and its chip are LE-1M only). The Coded
PHY keeps 1 Msym/s GFSK, so the front end is IDENTICAL to the 1M path —
phase-difference soft decisions over a dense lattice at sps samples per
symbol (`phy.demodulator.phase_diff`); everything Coded happens on the
symbol stream:

  1. SYNC on FEC block 1: the access address's coded symbol pattern
     (spec.coded.coded_aa_symbols — 256 symbols for the 32 AA bits at
     S=8) is correlated as a hard sign-agreement count across the dense
     lattice, like the uncoded 32-bit AA correlator but with 8x the
     pattern energy: the threshold THR_FRAC works several dB below the
     uncoded floor while keeping the 2^-256-class false-alarm floor.
  2. CI detection: both CI hypotheses' coded CI+TERM1 patterns (40
     symbols) are agreement-scored after the AA; the better one selects
     S for FEC block 2 (and is reported).
  3. FEC2 decode: SOFT phase-diff values are pattern-demapped
     (spec.coded.pattern_demap_soft) into per-FEC-bit metrics and run
     through the 8-state Viterbi (`phy.viterbi.viterbi_decode`) over the
     max-length trellis — variable length is handled exactly like the
     uncoded dense path (max-length decode, header length + CRC select
     the true span; Viterbi prefix decisions are insensitive to the
     post-packet noise tail).

The jitted core is static-shape (max-length) and vmaps over candidate
sync positions; the host wrapper walks the tiny candidate list.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..phy.demodulator import phase_diff
from ..phy.viterbi import viterbi_decode_r2
from ..spec import bits as B
from ..spec import coded as K
from ..spec import crc24 as C
from ..spec import whitening as W

MAX_PDU_BYTES = 42                    # 2 header + 1..39 payload + margin
MAX_PDU_BITS = MAX_PDU_BYTES * 8
MAX_FEC2_IN = MAX_PDU_BITS + 24 + K.N_TERM
# trellis length actually decoded: rounded up to even for the radix-2
# Viterbi (two steps per scan iteration — halves the sequential chain);
# the extra step consumes one more REAL symbol pair from the stream,
# and only the first MAX_PDU_BITS+24 decoded bits are consumed
DEC_STEPS = MAX_FEC2_IN + (MAX_FEC2_IN % 2)
THR_FRAC = 0.78                       # AA sync agreement threshold
# GF(2)-matmul prefix CRC over the 45-byte body window (42 PDU + 3 CRC)
# — same reformulation as the uncoded decode (rx.pipeline): replaces a
# 336-step bit-serial lax.scan per candidate with two matmuls
_CRC_V45, _CRC_MINIT45 = C.linear_crc_matrices(MAX_PDU_BYTES + 3)
_BYTE_W = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.int32)
_STATE_W = (2.0 ** np.arange(24)).astype(np.float32)


def _aa_pattern_pm(access_address_hex: str) -> np.ndarray:
    """(256,) +-1 coded-AA symbol pattern (S=8, AA bits only)."""
    aa_bits = B.hex_to_bits(access_address_hex)
    sym = K.pattern_map(K.fec_encode(aa_bits), 8)
    return sym.astype(np.float32) * 2 - 1


def _ci_patterns_pm(access_address_hex: str) -> np.ndarray:
    """(2, 40) +-1 coded CI+TERM1 symbol patterns for CI in {S8, S2}.

    The FEC encoder state after the AA bits carries into CI coding, so
    the pattern is the FULL FEC1 stream's tail, not an isolated encode.
    """
    aa_bits = B.hex_to_bits(access_address_hex)
    out = []
    for s2 in (8, 2):
        full = K.coded_aa_symbols(access_address_hex, s2=s2)
        out.append(full[256:].astype(np.float32) * 2 - 1)
    return np.stack(out)


@partial(jax.jit, static_argnames=("sps", "max_candidates"))
def coded_sync_and_decode(i, q, aa_pm, ci_pm, whiten_bits, crc_init_table,
                          sps: int, max_candidates: int = 4):
    """One block -> coded candidate arrays.

    aa_pm (256,), ci_pm (2, 40): +-1 patterns from the helpers above.
    whiten_bits (MAX_PDU_BITS+24,), crc_init_table: table-order init
    int (spec.crc24.lfsr_init_to_table_init).
    Returns dict of (max_candidates, ...) arrays: pos (symbol-lattice
    sample index of the AA start), valid, ci_s2 (detected S), crc_ok,
    payload_len, pdu_bits (MAX_PDU_BITS,).
    """
    from .pipeline import earliest_hits

    d = phase_diff(i, q, sps)                     # soft, len N - sps
    n = d.shape[0]

    # hard sign-agreement correlation of the coded AA (256 symbols) as
    # ONE symbol-dilated conv (the uncoded aa_match_counts form scaled
    # to 256 taps — a per-position gather of (n, 256) was ~40x slower
    # through XLA on TPU)
    sgn = jnp.where(d > 0, 1.0, -1.0)
    span_aa = 256 * sps
    # sync may land anywhere the AA pattern fits; the FEC2 window reads
    # are clipped (a packet near the block end decodes as far as the
    # samples allow — the header length + CRC still gate correctness)
    n_corr = max(n - span_aa, 1)
    # phase-split: positions == p (mod sps) form an UNdilated 256-tap
    # conv over the phase-p symbol subsequence — TPU lowers this far
    # better than a 1-channel rhs-dilated conv (27 -> ~3 ms/8.2ms
    # block), and the sps phases batch on the conv's N axis. DEFAULT
    # precision is EXACT here: +-1 operands and sums <= 256 are
    # bf16-representable with f32 accumulation.
    m = (n_corr + sps - 1) // sps + 256
    pad_to = m * sps
    sgp = jnp.pad(sgn, (0, max(0, pad_to - sgn.shape[0])))[: pad_to]
    lhs = sgp.reshape(m, sps).T[:, None, :]            # (sps, 1, m)
    corr_p = jax.lax.conv_general_dilated(
        lhs, aa_pm[None, None, :],
        window_strides=(1,), padding="VALID",
        preferred_element_type=jnp.float32)[:, 0, :]   # (sps, m-255)
    corr = corr_p.T.reshape(-1)[:n_corr]               # interleave phases
    agree = (corr + 256.0) * 0.5                       # matches = (corr+N)/2

    thr = jnp.float32(int(256 * THR_FRAC))
    # peak-gate: a hit must also be the agreement maximum within its
    # +-(sps-1) phase neighborhood — threshold-earliest alone syncs one
    # sample off-center (the neighbor phase crosses the threshold first)
    # and off-center soft metrics corrupt the S=2 Viterbi input
    win = jax.lax.reduce_window(
        agree, -jnp.inf, jax.lax.max, (2 * sps - 1,), (1,), "SAME")
    hit = (agree >= thr) & (agree >= win)
    # earliest max_candidates hits (hierarchical selection — the 256-
    # symbol pattern has one peak-gated hit per packet, so explicit
    # span-eating is unnecessary; duplicates would CRC-gate anyway)
    pos_sel, valid, _num = earliest_hits(hit, max_candidates, 0)
    pos_all = jnp.where(valid, pos_sel, -1)
    pos = jnp.clip(pos_sel, 0, n_corr - 1)

    def decode_one(p):
        # CI detection: agreement of the 40 CI/TERM1 symbols
        base = p + span_aa
        ci_idx = base + jnp.arange(40) * sps
        ci_sgn = sgn[jnp.clip(ci_idx, 0, n - 1)]
        score8 = (ci_sgn * ci_pm[0] > 0).sum()
        score2 = (ci_sgn * ci_pm[1] > 0).sum()
        use_s2 = score2 > score8
        s_det = jnp.where(use_s2, 2, 8)

        # FEC2 soft metrics at the detected S. Static shapes: build BOTH
        # and select (the wider S=8 window is the superset).
        fec2_base = base + 40 * sps

        def metrics(s):
            p_sym = 1 if s == 2 else 4
            n_sym = DEC_STEPS * 2 * p_sym
            sym_idx = fec2_base + jnp.arange(n_sym) * sps
            soft = d[jnp.clip(sym_idx, 0, n - 1)]
            if s == 2:
                m = soft
            else:
                p1 = jnp.asarray(np.asarray(K.P4_MAP[1], np.float32) * 2 - 1)
                m = soft.reshape(-1, 4) @ p1
            la = m[0::2]
            lb = m[1::2]
            return la, lb

        la8, lb8 = metrics(8)
        la2, lb2 = metrics(2)
        la = jnp.where(use_s2, la2, la8)
        lb = jnp.where(use_s2, lb2, lb8)
        bits, _ = viterbi_decode_r2(la, lb, DEC_STEPS)
        body = bits[: MAX_PDU_BITS + 24] ^ whiten_bits.astype(jnp.int8)
        pdu_bits = body[:MAX_PDU_BITS]

        # length from the de-whitened header; CRC over the true span via
        # the GF(2) prefix matmuls (exact: parity counts <= 360 in f32)
        plen = jnp.clip(
            jnp.sum(pdu_bits[8:16].astype(jnp.int32)
                    << jnp.arange(8, dtype=jnp.int32)), 0, MAX_PDU_BYTES - 2)
        body_f = body.astype(jnp.float32)
        contrib = jnp.dot(body_f, jnp.asarray(_CRC_V45))
        init_bits = ((crc_init_table >> jnp.arange(24)) & 1
                     ).astype(jnp.float32)
        state_bits = (contrib + jnp.dot(init_bits, jnp.asarray(_CRC_MINIT45))
                      ).astype(jnp.int32) & 1
        states = jnp.dot(
            state_bits.reshape(MAX_PDU_BYTES + 3, 24).astype(jnp.float32),
            jnp.asarray(_STATE_W)).astype(jnp.int32)
        body_bytes = jnp.dot(
            body_f.reshape(MAX_PDU_BYTES + 3, 8),
            jnp.asarray(_BYTE_W, jnp.float32)).astype(jnp.int32)
        crc_state = states[plen + 1]        # after 2 header + plen bytes
        crc_rcv = (body_bytes[plen + 2] + body_bytes[plen + 3] * 256
                   + body_bytes[plen + 4] * 65536)
        crc_ok = crc_state == crc_rcv
        return s_det, plen, crc_ok, pdu_bits

    s_det, plen, crc_ok, pdu_bits = jax.vmap(decode_one)(pos)
    return {
        "pos": pos_all,
        "valid": valid,
        "ci_s2": s_det,
        "payload_len": plen,
        "crc_ok": crc_ok & valid,
        "pdu_bits": pdu_bits,
        "agree": jnp.take(agree, jnp.clip(pos, 0, n_corr - 1)),
    }


def decode_coded(i, q, channel: int, sps: int = 4,
                 access_address_hex: str = "d6be898e",
                 crc_init_hex: str = "555555", max_candidates: int = 4):
    """Host wrapper: IQ block -> list of decoded coded packets."""
    aa_pm = jnp.asarray(_aa_pattern_pm(access_address_hex))
    ci_pm = jnp.asarray(_ci_patterns_pm(access_address_hex))
    whiten = jnp.asarray(
        W.whitening_bits(channel, MAX_PDU_BITS + 24))
    crc_init = jnp.int32(C.lfsr_init_to_table_init(crc_init_hex))
    out = coded_sync_and_decode(
        jnp.asarray(i, jnp.float32), jnp.asarray(q, jnp.float32),
        aa_pm, ci_pm, whiten, crc_init, sps=sps,
        max_candidates=max_candidates)
    out = {k: np.asarray(v) for k, v in out.items()}
    pkts = []
    for k in range(max_candidates):
        if not out["valid"][k]:
            break
        plen = int(out["payload_len"][k])
        pdu = B.bits_to_bytes(out["pdu_bits"][k][: (2 + plen) * 8])
        pkts.append({
            "pos": int(out["pos"][k]),
            "s": int(out["ci_s2"][k]),
            "crc_ok": bool(out["crc_ok"][k]),
            "payload_len": plen,
            "pdu_bytes": pdu,
            "aa_agree": int(out["agree"][k]),
        })
    return pkts
