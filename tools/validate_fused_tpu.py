"""Hardware validation: compiled fused kernels vs the XLA path on TPU.

Runs the synthetic multi-channel packet scene through BOTH wideband
pipelines on the attached device and asserts identical packet sets
(positions, CRC verdicts, PDU octets over the packet span) — the same
criterion as tests/test_wideband_fused.py, but with the Pallas kernels
COMPILED for the real chip instead of interpret mode.

Usage: python tools/validate_fused_tpu.py   (requires a TPU)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from btle_tpu.golden import model as G
    from btle_tpu.spec import bits as B
    from btle_tpu.spec import crc24 as C
    from btle_tpu.spec import whitening as W
    from btle_tpu.wideband import synthesize_wideband
    from btle_tpu.wideband.channelizer import bin_to_channel
    from btle_tpu.wideband.fused import wideband_scan_fused
    from btle_tpu.wideband.sniffer import wideband_scan

    rng = np.random.default_rng(0)

    def burst(ch, n_payload):
        hdr = 0x40 if ch in (37, 38, 39) else 0x01
        payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
        pdu = B.bytes_to_bits(
            np.concatenate([[hdr, n_payload], payload]).astype(np.uint8))
        phy = G.assemble_phy_bits(pdu, ch)
        return G.gfsk_modulate_float(phy, 80)

    chans = (37, 0, 9, 17, 25, 36, 38, 39)
    signals, offsets = {}, {}
    for k, ch in enumerate(chans):
        signals[ch] = burst(ch, 8 + k)
        offsets[ch] = 9000 + 30000 * k
    wi, wq = synthesize_wideband(signals, 300000, offsets)
    wi += rng.normal(0, 0.01, wi.shape).astype(np.float32)
    wq += rng.normal(0, 0.01, wq.shape).astype(np.float32)

    aa = jnp.asarray(B.hex_to_bits("d6be898e"))
    mask = jnp.asarray(np.ones(32, np.int8))
    whiten = jnp.asarray(
        np.stack([W.whitening_bits(bin_to_channel(m), 336) for m in range(40)]))
    crc = jnp.asarray(np.full(40, C.lfsr_init_to_table_init("555555"), np.int32))
    adv = jnp.asarray(
        np.array([bin_to_channel(m) in (37, 38, 39) for m in range(40)]))

    kw = dict(sps=4, lag=4, max_candidates=16)
    ref = {k: np.asarray(v) for k, v in wideband_scan(
        jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
        **kw).items()}
    got = {k: np.asarray(v) for k, v in wideband_scan_fused(
        jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
        **kw).items()}

    failures = 0
    for key in ("pos", "valid", "crc_ok", "payload_len", "len_ok",
                "num_hits"):
        if not np.array_equal(ref[key], got[key]):
            bad = np.argwhere(np.asarray(ref[key]) != np.asarray(got[key]))
            print(f"FAIL {key}: {len(bad)} mismatches, first {bad[:4]}")
            failures += 1
        else:
            print(f"ok   {key}")
    n_ok = int(ref["crc_ok"].sum())
    pdu_ok = True
    for m, k in np.argwhere(ref["crc_ok"]):
        span = 2 + int(ref["payload_len"][m, k]) + 3
        if not np.array_equal(ref["pdu_bytes"][m, k, :span],
                              got["pdu_bytes"][m, k, :span]):
            pdu_ok = False
            failures += 1
            print(f"FAIL pdu at ch-bin {m} slot {k}")
    print(f"ok   pdu octets ({n_ok} CRC-OK packets)" if pdu_ok else "")
    mm = np.abs(ref["mag_mean"][ref["valid"]] - got["mag_mean"][got["valid"]])
    rel = mm / np.maximum(np.abs(ref["mag_mean"][ref["valid"]]), 1e-6)
    print(f"ok   mag_mean (max rel diff {rel.max():.2e})"
          if rel.max() < 0.02 else f"FAIL mag rel {rel.max()}")
    failures += rel.max() >= 0.02

    if n_ok < len(chans):
        print(f"FAIL expected >= {len(chans)} CRC-OK packets, got {n_ok}")
        failures += 1

    # production mode (bf16x2w): packet-level criterion — identical
    # CRC-OK packet set (channel bin, pdu octets); slot-exact equality is
    # not required (bf16 operand rounding can flip noise decisions)
    prod = {k: np.asarray(v) for k, v in wideband_scan_fused(
        jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
        compute_dtype="bf16x2w", **kw).items()}

    def pkt_set(o):
        out = set()
        for m, k in np.argwhere(o["crc_ok"]):
            span = 2 + int(o["payload_len"][m, k]) + 3
            out.add((int(m), bytes(o["pdu_bytes"][m, k, :span].astype(np.uint8))))
        return out

    if pkt_set(prod) == pkt_set(ref):
        print(f"ok   bf16x2w packet set ({len(pkt_set(prod))} packets)")
    else:
        print("FAIL bf16x2w packet set:",
              pkt_set(prod) ^ pkt_set(ref))
        failures += 1
    print("RESULT:", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
