"""Dev sweep: pick the LE-2M channel-filter passband (prototype cutoff).

The 2 Msym/s GFSK spectrum extends past the classic +-1 MHz half-channel
cutoff, so the shared 1M prototype truncates the 2M signal (~2-4 dB
decode-floor penalty, PERF.md round 4). Wider passbands recover signal
energy but admit decimation aliasing (folds start at 4 - cutoff MHz) and
adjacent-channel leakage. This sweeps cutoff x SNR over a dense all-40-
channel 2M scene (shipped TX composition) and reports byte-exact decode
counts + ghost CRC-OK packets per cell — the filter-design evidence
behind sniffer.CUTOFF_MHZ_2M.

Runs on any backend (XLA path; filter fidelity is backend-independent).
Usage: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/dev_2m_cutoff.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scene(rng, n_wb, phy="2m"):
    """~40 packets, one per channel, random payloads, explicit offsets."""
    from btle_tpu.spec import bits as B
    from btle_tpu.tx import parse_descriptor
    from btle_tpu.tx.synth import scene_to_wideband

    placed, expected = [], {}
    for k, ch in enumerate(range(40)):
        payload = rng.integers(0, 256, 8 + (k % 12), dtype=np.uint8)
        if ch in (37, 38, 39):
            d = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                 f"-AdvA-{bytes(payload[:6]).hex()}"
                 f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            d = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                 f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
        spec = parse_descriptor(d)
        if phy == "2m":
            spec = spec.to_2m()
        placed.append((spec, 12_000 + 55_000 * k))
        expected[ch] = np.asarray(
            B.bits_to_bytes(spec.info_bits[spec.pdu_start:]), np.uint8)
    wi, wq = scene_to_wideband(placed, n_wb, noise_std=0.0)
    return wi, wq, expected


def main():
    import jax.numpy as jnp

    from btle_tpu.wideband.channelizer import bin_to_channel, channel_to_bin
    from btle_tpu.wideband.sniffer import (ch_sps_for_phy,
                                           default_scan_tables,
                                           wideband_scan)

    phy = "2m" if "--1m" not in sys.argv else "1m"
    sps = ch_sps_for_phy(phy)
    rng = np.random.default_rng(0x2A)
    n_wb = 12_000 + 55_000 * 40 + 60_000
    wi, wq, expected = build_scene(rng, n_wb, phy)
    aa, mask, whiten, crc, adv = default_scan_tables()

    # int8-peak-referenced SNR like the round-4 measurement: the
    # C-flavor bursts are int8-scale, so sigma = peak * 10^(-snr/20)
    peak = float(np.max(np.abs(wi)))
    snrs = [-4.0, -2.0, 0.0, 2.0, 4.0, 8.0]
    cutoffs = [1.0, 1.1, 1.2, 1.3, 1.4, 1.5]
    noise = np.random.default_rng(1).normal(
        0, 1.0, (2, len(wi))).astype(np.float32)

    print(f"phy={phy}  cells: decoded/40 (ghost CRC-OK pkts)", flush=True)
    print("cutoff  " + "  ".join(f"{s:>5.0f}dB" for s in snrs), flush=True)
    for cutoff in cutoffs:
        row = []
        for snr in snrs:
            sig = peak * 10 ** (-snr / 20)
            out = wideband_scan(
                jnp.asarray(wi + sig * noise[0]),
                jnp.asarray(wq + sig * noise[1]),
                aa, mask, whiten, crc, adv, sps=sps, lag=sps,
                max_candidates=8, cutoff_mhz=cutoff)
            out = {k: np.asarray(v) for k, v in out.items()}
            n_ok, ghosts = 0, 0
            for ch, pdu in expected.items():
                m = channel_to_bin(ch)
                hit = any(
                    np.array_equal(
                        out["pdu_bytes"][m, k, : len(pdu)].astype(np.uint8),
                        pdu)
                    for k in np.flatnonzero(out["crc_ok"][m]))
                n_ok += hit
            for m in range(40):
                for k in np.flatnonzero(out["crc_ok"][m]):
                    pdu = expected[bin_to_channel(m)]
                    if not np.array_equal(
                            out["pdu_bytes"][m, k, : len(pdu)].astype(np.uint8),
                            pdu):
                        ghosts += 1
            row.append(f"{n_ok:3d}({ghosts})")
        print(f"{cutoff:5.1f}  " + "  ".join(f"{c:>7s}" for c in row),
              flush=True)


if __name__ == "__main__":
    main()
