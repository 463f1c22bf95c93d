#!/usr/bin/env python3
"""End-to-end walkthrough of the framework's main flows.

1. Build a transmission plan with typed builders, synthesize IQ.
2. Sniff it back on one channel (C-tool semantics) with pcap + NDJSON.
3. Place packets on several BLE channels in one 80 Msps wideband stream
   and decode them all at once with the polyphase channelizer.
4. Simulate a connection (CONNECT_REQ -> hops) and follow it.
5. Run a mini BER point and a recon quickscan.

Runs on CPU or TPU:  python examples/end_to_end.py
"""

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from btle_tpu.cli import TxPlan, quickscan
    from btle_tpu.cli.events import packet_event_to_model
    from btle_tpu.cli.tx_builder import Discovery, IBeacon
    from btle_tpu.golden import model as G
    from btle_tpu.sim import BerHarness
    from btle_tpu.spec import bits as B
    from btle_tpu.stream import NdjsonEmitter, Sniffer, SnifferConfig, array_source
    from btle_tpu.tx.synth import plan_to_stream
    from btle_tpu.wideband import WidebandConfig, WidebandSniffer, synthesize_wideband

    # ---- 1. typed TX plan -> IQ ----
    plan = TxPlan([
        Discovery(channel=37, adv_a="01:02:03:04:05:06",
                  local_name="tpu-btle demo", flags=0x06, space_ms=2),
        IBeacon(channel=37, adv_a="0a:0b:0c:0d:0e:0f", major=1, minor=2,
                space_ms=2),
    ])
    packets = plan.synthesize()
    i, q = plan_to_stream(packets, sps=4)
    print(f"[tx] synthesized {len(packets)} packets, {len(i)} samples")

    # ---- 2. sniff back with outputs ----
    buf = io.StringIO()
    sn = Sniffer(SnifferConfig(channel=37, sps=4, rssi=True),
                 ndjson=NdjsonEmitter(buf), quiet_text=True)
    events = sn.run(array_source(i, q))
    ok = [e for e in events if e.crc_ok]
    print(f"[rx] {len(ok)} packets decoded CRC-OK; "
          f"first AdvA {ok[0].payload.adv_a.hex()}")

    # ---- 3. wideband: several channels at once ----
    rng = np.random.default_rng(0)
    signals = {}
    for ch in (37, 2, 25):
        payload = rng.integers(0, 256, 12, dtype=np.uint8)
        hb = 0x40 if ch in (37, 38, 39) else 0x01
        pdu = B.bytes_to_bits(np.concatenate([[hb, 12], payload]).astype(np.uint8))
        signals[ch] = G.gfsk_modulate_float(G.assemble_phy_bits(pdu, ch), 80)
    wi, wq = synthesize_wideband(signals, 150000, {37: 4000, 2: 50000, 25: 100000})
    wb = WidebandSniffer(WidebandConfig())
    pkts = [p for p in wb.run(wi, wq) if p.crc_ok]
    print(f"[wideband] decoded on channels {sorted(p.channel for p in pkts)} "
          "from one 80 Msps stream")

    # ---- 4. recon over the decoded events ----
    models = [packet_event_to_model(e) for e in events if e.header is not None]
    summary = quickscan(models)
    print(f"[recon] {summary.n_devices} devices; "
          f"fingerprints {summary.fingerprints_seen}")

    # ---- 5. one BER point at the reference anchor ----
    h = BerHarness()
    ber, pkt_ok, nbits = h.ber_point(11.0, 0.0, 100, seed=3)
    print(f"[ber] 11 dB @ 0 ppm: BER {ber:.2e} ({pkt_ok} pkts ok / {nbits} bits)")


if __name__ == "__main__":
    main()
