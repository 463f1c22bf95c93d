#!/usr/bin/env python3
"""Dense-traffic hardware soak of the fused wideband pipeline.

Synthesizes a sustained multi-channel BLE airspace — hundreds of packets
with known payloads spread over all 40 channels and the whole capture —
streams it block-by-block through WidebandSniffer on the attached
backend, and asserts every injected packet decodes byte-exactly. This is
the scaled-up version of wideband/selftest.py's known-answer gate: the
selftest proves the deployed kernel decodes ONE scene; the soak proves
sustained decode correctness under production traffic density (the
reference's analog is its live phone-in-the-room test, README.md:33-55).

Usage:  python tools/soak_fused_tpu.py [--seconds 0.25] [--packets 150]
        [--dtype bf16x2w|f32|xla] [--phy 1m|2m] [--seed 0]
        [--connections N [--map-updates]]

Exit code 0 = every packet decoded byte-exactly; 1 otherwise.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0.25,
                    help="airspace duration (80 Msps wideband)")
    ap.add_argument("--packets", type=int, default=150)
    ap.add_argument("--phy", default="1m", choices=["1m", "2m"],
                    help="frame + scan the whole scene for this LE PHY "
                         "(2m: 16-bit preambles, 40 samples/symbol "
                         "bursts, sps=2 scan — beyond the reference)")
    ap.add_argument("--dtype", default="bf16x2w",
                    choices=["bf16x2w", "f32", "xla"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cutoff", type=float, default=None,
                    help="channel-filter cutoff MHz override "
                         "(default: per-phy, sniffer.cutoff_for_phy)")
    ap.add_argument("--connections", type=int, default=0,
                    help="also follow N concurrent connections (<=12): "
                         "CONNECT_REQs + per-connection data packets "
                         "before AND after a simultaneous hop re-key")
    ap.add_argument("--map-updates", action="store_true",
                    help="with --connections: each connection also airs "
                         "an LL_CHANNEL_MAP_REQ (instant 1) masking its "
                         "dwell-2 channel, so the second data packet "
                         "lands on the CSA#1 remap — hardware E2E of "
                         "live map application through the fused "
                         "pipeline")
    args = ap.parse_args()
    if not 0 <= args.connections <= 12:
        ap.error("--connections must be 0..12 (distinct hop values)")
    if args.map_updates and not args.connections:
        ap.error("--map-updates needs --connections")

    import jax

    print("devices:", jax.devices(), flush=True)

    from btle_tpu.spec import bits as B
    from btle_tpu.tx import parse_descriptor_sequence
    from btle_tpu.tx.synth import burst_num_samples, scene_to_wideband
    from btle_tpu.wideband import WidebandConfig, WidebandSniffer

    rng = np.random.default_rng(args.seed)
    n_wb = int(args.seconds * 80_000_000)
    if args.connections and n_wb < 29000 * 80:
        n_wb = 29000 * 80   # the connection schedule spans ~26 ms of air

    # One packet = a real descriptor (ADV_NONCONN_IND on 37/38/39, LL_DATA
    # keyed to the default scan AA elsewhere), synthesized and composed by
    # the SHIPPED TX path (tx.synth.scene_to_wideband — the same code
    # `tx --wideband-out` runs). Packets are spread uniformly over channels
    # and time with per-channel spacing that guarantees no intra-channel
    # overlap (AA+PDU span at 4 Msps < 2000 ch-samples for 37-byte
    # payloads; keep >= 4000 ch-samples = 80k wb-samples apart).
    t0 = time.time()
    placed_specs = []    # (PacketSpec, offset_wb)
    injected = []        # (channel, offset_wb, pdu_bytes)
    per_ch_next = {}
    conn_channels = set()

    # connection-following phase (--connections N): N CONNECT_REQs in
    # the first block, per-connection sync packets on each hop channel
    # at ~8.3 ms, then — after the interval clock hops EVERY connection
    # at the 22528 us block tick (interval 16: 20000-7000 us guard) —
    # a second packet per connection on its new channel. Background
    # traffic is kept off the connection channels (once owned, a channel
    # no longer decodes the default scan AA) and off the advertising
    # channels until the CONNECT_REQ burst has aired. Timing mirrors
    # tests/test_multifollow.py::TestDenseMultiFollow.
    hops = [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16][: args.connections]
    # after their scripted dwell-2 packets the trackers keep following:
    # one hop at +13000 us and one skip-retune at +16000 us more before
    # the staleness drop (drop_after_intervals=2 -> ~65 ms) unregisters
    # them — so a connection can OWN any of its first four dwell
    # channels while alive, and background traffic (keyed to the scan
    # AA) must stay off those until every connection has dropped
    conn_channels = {(k * h) % 37 for h in hops for k in (1, 2, 3, 4)}
    if args.map_updates:
        # masking dwell-2 moves dwells 2..4 onto the CSA#1 remap of the
        # reduced map — quiet those channels too (plus the originals:
        # the update only applies from the hop at ~22.5 ms)
        from btle_tpu.spec.channels import csa1_channel

        for h in hops:
            masked = (2 * h) % 37
            used = tuple(c for c in range(37) if c != masked)
            conn_channels |= {csa1_channel((k * h) % 37, used)
                              for k in (2, 3, 4)}
    _CONN_QUIET_WB = 70_000 * 80   # all connections dropped by ~65 ms
    if args.connections:
        for ch in (37, 38, 39):
            per_ch_next[ch] = (200 + (args.connections // 3 + 1) * 450
                               + 600) * 80
        for j, hop in enumerate(hops):
            aa = 0x53A00000 + j * 0x01103
            crc = f"{0x111111 + j * 0x030201:06x}"
            adv_ch = [37, 38, 39][j % 3]
            cr = (f"{adv_ch}-CONNECT_REQ-TxAdd-0-RxAdd-0"
                  f"-InitA-001830EA965F-AdvA-90D7EBB192{j:02X}"
                  f"-AA-{aa:08X}-CRCInit-{crc.upper()}-WinSize-02"
                  f"-WinOffset-000F-Interval-0010-Latency-0000"
                  f"-Timeout-07D0-ChM-1FFFFFFFFF-Hop-{hop}-SCA-5-Space-1")
            descs = [cr]
            times_us = [200 + (j // 3) * 450]
            dwell2_ch = (2 * hop) % 37
            if args.map_updates:
                # mask the dwell-2 channel at instant 1: the hop at
                # ~22.5 ms applies the map, so dwell 2 lands on the
                # CSA#1 remap used[dwell2 % 36]
                masked = dwell2_ch
                onair = ((1 << 37) - 1) & ~(1 << masked)
                chm_disp = onair.to_bytes(5, "little")[::-1].hex().upper()
                used = tuple(c for c in range(37) if c != masked)
                from btle_tpu.spec.channels import csa1_channel

                dwell2_ch = csa1_channel((2 * hop) % 37, used)
                descs.append(
                    f"{hop % 37}-LL_CHANNEL_MAP_REQ-AA-{aa:08X}-LLID-3"
                    f"-NESN-0-SN-0-MD-0-ChM-{chm_disp}-Instant-0001"
                    f"-CRCInit-{crc.upper()}-Space-1")
                times_us.append(15000 + j * 50)
            for ch, t_us in ((hop % 37, 8300 + j * 50),
                             (dwell2_ch, 24700 + j * 50)):
                payload = rng.integers(0, 256, 6 + j, dtype=np.uint8)
                descs.append(
                    f"{ch}-LL_DATA-AA-{aa:08X}-LLID-1-NESN-0-SN-0-MD-0"
                    f"-DATA-{bytes(payload).hex()}-CRCInit-{crc.upper()}"
                    f"-Space-1")
                times_us.append(t_us)
            specs, _ = parse_descriptor_sequence(descs)
            if args.phy == "2m":
                specs = [s.to_2m() for s in specs]
            for spec, t_us in zip(specs, times_us):
                placed_specs.append((spec, t_us * 80))
                injected.append((spec.channel, t_us * 80, bytes(
                    B.bits_to_bytes(spec.info_bits[spec.pdu_start:]))))

    placed = 0
    attempts = 0
    while placed < args.packets and attempts < args.packets * 40:
        attempts += 1
        ch = int(rng.integers(0, 40))
        if ch in (37, 38, 39):
            n_payload = int(rng.integers(6, 38))
            payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
            desc = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                    f"-AdvA-{bytes(payload[:6]).hex()}"
                    f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            n_payload = int(rng.integers(1, 32))
            payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
            desc = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                    f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
        (spec,), _ = parse_descriptor_sequence([desc])
        if args.phy == "2m":
            spec = spec.to_2m()
        span_wb = burst_num_samples(spec) + 80_000
        off = int(rng.integers(0, max(1, n_wb - span_wb)))
        lo = per_ch_next.get(ch, 0)
        if ch in conn_channels and off < _CONN_QUIET_WB:
            lo = max(lo, _CONN_QUIET_WB)   # wait out the live connections
        if off < lo:
            off = lo
        if off + span_wb >= n_wb:
            continue
        per_ch_next[ch] = off + span_wb
        placed_specs.append((spec, off))
        injected.append((ch, off, bytes(
            B.bits_to_bytes(spec.info_bits[spec.pdu_start:]))))
        placed += 1
    # light noise floor so ties are not degenerate zeros
    wi, wq = scene_to_wideband(placed_specs, n_wb, noise_std=0.01,
                               seed=args.seed)
    per_conn = 4 if args.map_updates else 3
    print(f"synthesized {placed} background packets"
          + (f" + {per_conn * args.connections} connection packets "
             f"({args.connections} connections"
             + (", with map updates" if args.map_updates else "") + ")"
             if args.connections else "")
          + f" over {n_wb / 80e6:.3f}s of airspace "
          f"({time.time()-t0:.1f}s)", flush=True)

    cfg = WidebandConfig(phy=args.phy, fused=args.dtype != "xla",
                         cutoff_mhz=args.cutoff,
                         fused_dtype=args.dtype if args.dtype != "xla" else "f32",
                         follow_connections=args.connections > 0,
                         max_follow=max(1, args.connections),
                         # bounded wander: stale connections unregister
                         # ~2 intervals after their last packet, freeing
                         # their channels for the background traffic
                         drop_after_intervals=2 if args.connections else None)
    sn = WidebandSniffer(cfg)
    t0 = time.time()
    pkts = sn.run(wi, wq)
    dt = time.time() - t0
    got = {}
    for p in pkts:
        if p.crc_ok:
            got.setdefault((p.channel, bytes(p.pdu_bytes)), []).append(
                p.sample_pos)

    missing = []
    for ch, off, pdu in injected:
        if (ch, pdu) not in got:
            missing.append((ch, off, pdu.hex()))
    n_inj = len(injected)
    extra_crc_ok = sum(len(v) for v in got.values()) - (n_inj - len(missing))
    conn_fail = False
    if args.connections:
        evts = sn.multi_follower.events
        n_started = len({e.access_addr for e in evts
                         if e.event == "track_start"})
        n_dropped = len({e.access_addr for e in evts
                         if e.event == "track_drop"})
        # every connection must register, deliver its packets (checked
        # via `injected` above), then stale-drop cleanly
        conn_fail = not (n_started == n_dropped == args.connections)
        n_updated = len({e.access_addr for e in evts
                         if e.event == "chm_update"})
        if args.map_updates:
            # every connection's LL_CHANNEL_MAP_REQ must decode AND apply
            conn_fail |= n_updated != args.connections
        print(f"connections: {n_started}/{args.connections} registered, "
              f"{n_dropped} stale-dropped, "
              f"{len(sn.multi_follower.connections)} still tracked"
              + (f", {n_updated} map-updated" if args.map_updates else ""),
              flush=True)
    print(f"decoded {n_inj - len(missing)}/{n_inj} injected packets "
          f"(+{extra_crc_ok} duplicate/extra CRC-OK) in {dt:.1f}s host "
          f"wall-clock ({n_wb/dt/1e6:.0f} Msps incl. per-block host "
          f"round trips; bench.py measures the pipelined device rate)",
          flush=True)
    if sn.truncated_channels:
        print(f"note: {sn.truncated_channels} slot-exhaustion rescans",
              flush=True)
    for m in missing[:10]:
        print("MISSING", m, flush=True)
    ok = not missing and not conn_fail
    print("RESULT:", "PASS" if ok else
          f"FAIL ({len(missing)} missing"
          + (", connection tracking incomplete" if conn_fail else "") + ")",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
