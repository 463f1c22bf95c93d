"""Wideband LE Coded scan: all 40 channels of Coded-PHY airspace at once.

The Coded PHY keeps 1 Msym/s, so the polyphase channelizer output
(4 Msps per channel) carries 4 samples per symbol exactly like LE 1M —
the 80 Msps capture is channelized ONCE and every channel runs the
coded receiver (rx.coded.coded_sync_and_decode: coded-AA sync, CI
detection, soft-Viterbi FEC2) in one vmapped program. Beyond-reference:
the C tool has no Coded support at all, let alone 40 channels of it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..rx.coded import (MAX_PDU_BITS, _aa_pattern_pm, _ci_patterns_pm,
                        coded_sync_and_decode)
from ..spec import bits as B
from ..spec import crc24 as C
from ..spec import whitening as W
from .channelizer import DEFAULT_TAPS, M, bin_to_channel, channelize
from .sniffer import cutoff_for_phy


@partial(jax.jit, static_argnames=("sps", "max_candidates", "num_taps",
                                   "has_context", "cutoff_mhz"))
def wideband_scan_coded(i_wb, q_wb, aa_pm, ci_pm, whiten_rows, crc_init_bits,
                        sps: int = 4, max_candidates: int = 4,
                        num_taps: int = DEFAULT_TAPS,
                        has_context: bool = False, cutoff_mhz: float = 1.0):
    """80 Msps block -> per-channel coded candidate arrays (40, K, ...)."""
    y_i, y_q = channelize(i_wb, q_wb, num_taps=num_taps,
                          has_context=has_context, cutoff_mhz=cutoff_mhz)

    def one(i, q, wh):
        return coded_sync_and_decode(i, q, aa_pm, ci_pm, wh, crc_init_bits,
                                     sps=sps,
                                     max_candidates=max_candidates)

    return jax.vmap(one, in_axes=(0, 0, 0))(y_i, y_q, whiten_rows)


def coded_scan_tables(access_address_hex: str = "d6be898e",
                      crc_init_hex: str = "555555"):
    """(aa_pm, ci_pm, whiten_rows, crc_init_bits) for the 40-bin scan."""
    aa_pm = jnp.asarray(_aa_pattern_pm(access_address_hex))
    ci_pm = jnp.asarray(_ci_patterns_pm(access_address_hex))
    whiten = jnp.asarray(np.stack(
        [W.whitening_bits(bin_to_channel(m), MAX_PDU_BITS + 24)
         for m in range(M)]))
    crc_init = jnp.int32(C.lfsr_init_to_table_init(crc_init_hex))
    return aa_pm, ci_pm, whiten, crc_init


def scan_coded_capture(i_wb, q_wb, max_candidates: int = 4,
                       access_address_hex: str = "d6be898e",
                       crc_init_hex: str = "555555"):
    """Host convenience: whole capture -> list of coded packet dicts."""
    aa_pm, ci_pm, whiten, crc_init = coded_scan_tables(
        access_address_hex, crc_init_hex)
    out = wideband_scan_coded(
        jnp.asarray(i_wb, jnp.float32), jnp.asarray(q_wb, jnp.float32),
        aa_pm, ci_pm, whiten, crc_init, max_candidates=max_candidates,
        cutoff_mhz=cutoff_for_phy("1m"))
    out = {k: np.asarray(v) for k, v in out.items()}
    pkts = []
    for m in range(M):
        for k in range(max_candidates):
            if not out["valid"][m, k]:
                break
            plen = int(out["payload_len"][m, k])
            pkts.append({
                "channel": bin_to_channel(m),
                "pos": int(out["pos"][m, k]),
                "s": int(out["ci_s2"][m, k]),
                "crc_ok": bool(out["crc_ok"][m, k]),
                "payload_len": plen,
                "pdu_bytes": B.bits_to_bytes(
                    out["pdu_bits"][m, k][: (2 + plen) * 8]),
                "aa_agree": int(out["agree"][m, k]),
            })
    return pkts
