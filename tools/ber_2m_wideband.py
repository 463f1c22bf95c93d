"""LE-2M wideband sensitivity table: the channelized 2M penalty, measured.

The narrowband BER harness (tools/ber_sweep.py --phy 2m) shows the GFSK
demod itself is rate-invariant at fixed samples/symbol — the REAL 2M cost
is the channelizer: a 2 Msym/s GFSK spectrum passing a 4 Msps channel
filter. This measures packet decode rate vs int8-peak-referenced SNR for
three configurations over dense all-40-channel scenes (shipped TX
composition, several noise seeds):

    1M, cutoff 1.0 MHz   (the classic channel filter — baseline)
    2M, cutoff 1.0 MHz   (round-4 configuration: truncated 2M spectrum)
    2M, cutoff 1.2 MHz   (round-5 phy-aware prototype, sniffer.CUTOFF_MHZ_2M)

Output is the BER_CURVES.md table. Runs on any backend (XLA path).
Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/ber_2m_wideband.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dev_2m_cutoff import build_scene


def decode_count(out, expected, channel_to_bin):
    n_ok = 0
    for ch, pdu in expected.items():
        m = channel_to_bin(ch)
        n_ok += any(
            np.array_equal(
                out["pdu_bytes"][m, k, : len(pdu)].astype(np.uint8), pdu)
            for k in np.flatnonzero(out["crc_ok"][m]))
    return n_ok


def main():
    import jax.numpy as jnp

    from btle_tpu.wideband.channelizer import channel_to_bin
    from btle_tpu.wideband.sniffer import (ch_sps_for_phy,
                                           default_scan_tables,
                                           wideband_scan)

    aa, mask, whiten, crc, adv = default_scan_tables()
    n_wb = 12_000 + 55_000 * 40 + 60_000
    seeds = (0x2A, 0x2B, 0x2C)
    snrs = [-6.0, -4.0, -2.0, 0.0, 2.0]
    configs = [("1m", 1.0), ("2m", 1.0), ("2m", 1.2)]

    rows = {}
    for phy, cutoff in configs:
        sps = ch_sps_for_phy(phy)
        cells = []
        for snr in snrs:
            ok = tot = 0
            for seed in seeds:
                rng = np.random.default_rng(seed)
                wi, wq, expected = build_scene(rng, n_wb, phy)
                peak = float(np.max(np.abs(wi)))
                sig = peak * 10 ** (-snr / 20)
                nz = np.random.default_rng(seed + 1).normal(
                    0, sig, (2, len(wi))).astype(np.float32)
                out = wideband_scan(
                    jnp.asarray(wi + nz[0]), jnp.asarray(wq + nz[1]),
                    aa, mask, whiten, crc, adv, sps=sps, lag=sps,
                    max_candidates=8, cutoff_mhz=cutoff)
                out = {k: np.asarray(v) for k, v in out.items()}
                ok += decode_count(out, expected, channel_to_bin)
                tot += len(expected)
            cells.append((ok, tot))
            print(f"{phy}@{cutoff}: {snr:+.0f} dB -> {ok}/{tot}",
                  file=sys.stderr, flush=True)
        rows[(phy, cutoff)] = cells

    hdr = " | ".join(f"{s:+.0f} dB" for s in snrs)
    print(f"| config | {hdr} |")
    print("|---|" + "---:|" * len(snrs))
    for (phy, cutoff), cells in rows.items():
        cs = " | ".join(f"{ok}/{tot}" for ok, tot in cells)
        print(f"| {phy} cutoff {cutoff} MHz | {cs} |")


if __name__ == "__main__":
    main()
