#!/usr/bin/env python3
"""Production deployment walkthrough: the live-receiver plumbing.

Where end_to_end.py tours the DSP flows, this example wires up the
pieces a deployed receiver actually runs (the TPU-era analog of the
reference's btle_rx + ble_fpga_ctl stack):

1. IQ ingest: a transmitter plays timed bursts over UDP in the int16
   wire format; the C++ SPSC ring (runtime/) absorbs the stream and
   serves overlap-save blocks.
2. Narrowband sniff loop with a LIVE control channel: an external
   process retunes the running receiver (channel change mid-stream),
   exactly like the reference's ble_send_cmd register writes
   (host/ble_fpga_ctl/ble_send_cmd.c).
3. Wideband deployment configuration: the fused Pallas front end with
   the measured throughput/precision ladder (PERF.md) — bf16x2w (the
   shipped default) vs exact f32 (poly-inner parity mode) — selected
   per deployment.

Runs anywhere:  python examples/production_deployment.py
(On a TPU the fused kernel compiles natively and the bf16x2w mode is
the >10x-real-time path; on CPU this example keeps fused=False — the
portable XLA pipeline — since the Mosaic kernel only runs on TPUs, or
under Pallas interpret mode as the test suite does.)
"""

import os
import socket
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    from btle_tpu import runtime
    from btle_tpu.stream import Sniffer, SnifferConfig
    from btle_tpu.stream.control import ControlServer, send_command
    from btle_tpu.tx import synthesize
    from btle_tpu.tx.descriptor import parse_descriptor
    from btle_tpu.tx.playback import udp_transmit

    # ---- 1. wire ingest: UDP -> C++ ring -> overlap-save blocks ----
    if not runtime.available():
        print("native runtime unavailable; skipping ingest demo")
        i = q = None
    else:
        specs = [parse_descriptor(
            "37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-0a0b0c0d0e0f"
            "-AdvData-0201060709746f702d677574-Space-2")]
        pkts = synthesize(specs, flavor="c", sps=4)
        for p in pkts:
            p.i = p.i.astype(np.int16) * 32
            p.q = p.q.astype(np.int16) * 32
        ring = runtime.IqRingBuffer(1 << 20)
        port = free_udp_port()
        ingest = runtime.UdpIngest(ring, port, "i16")
        try:
            sent = udp_transmit(pkts, port, sps=4, num_repeat=2)
            import time
            deadline = time.time() + 5
            while ring.available_pairs < sent and time.time() < deadline:
                time.sleep(0.01)
            i, q = ring.drain()
        finally:
            ingest.stop()
        print(f"ingest: {sent} IQ pairs over UDP through the C++ ring")

    # ---- 2. live retune of a RUNNING sniffer (ble_send_cmd parity) ----
    # The sniffer polls its ControlServer at every block boundary;
    # send_command() is the ble_send_cmd analog an external host runs.
    ctl = ControlServer(port=0)
    sn = Sniffer(SnifferConfig(channel=37, scan_len=8192), quiet_text=True,
                 control=ctl)

    def blocks():
        if i is not None:
            yield i, q
        # retune the RUNNING receiver from "another host"
        send_command(ctl.port, channel=38)
        from btle_tpu.golden import model as G
        from btle_tpu.spec import bits as B
        pdu = B.bytes_to_bits(np.array(
            [0x42, 8, 9, 8, 7, 6, 5, 4, 0xDE, 0xAD], np.uint8))
        si, sq = G.gfsk_modulate_c(G.assemble_phy_bits(pdu, 38), 4)
        # place the burst a few blocks in so the retune (applied at the
        # next block boundary) lands first
        buf = np.zeros(40000, np.int16)
        buf_q = np.zeros(40000, np.int16)
        buf[20000 : 20000 + len(si)] = si.astype(np.int16) * 64
        buf_q[20000 : 20000 + len(sq)] = sq.astype(np.int16) * 64
        yield buf, buf_q

    events = sn.run(blocks())
    by_ch = {}
    for e in events:
        if e.crc_ok:
            by_ch.setdefault(e.channel, 0)
            by_ch[e.channel] += 1
    ctl.close()
    print(f"sniffer decoded per channel (retuned 37->38 mid-stream): "
          f"{by_ch}")
    assert 38 in by_ch, "retuned channel should decode"

    # ---- 3. wideband deployment configuration ----
    # Production ladder (PERF.md, measured on TPU v5e):
    #   shipped default:   fused=True, fused_dtype="bf16x2w" (>10x RT,
    #                      selftest-gated, packet-set-identical to f32)
    #   exact parity mode: fused=True, fused_dtype="f32" (poly inner)
    # On CPU this example keeps fused=False (the XLA path runs
    # everywhere); flip `on_tpu` logic for a real deployment.
    from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                   synthesize_wideband)
    from btle_tpu.golden import model as G
    from btle_tpu.spec import bits as B

    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = WidebandConfig(scan_len_ch=8192, fused=on_tpu,
                         fused_dtype="bf16x2w" if on_tpu else "f32")

    # Deployment gate: known-answer self-test of EXACTLY the pipeline
    # and kernel config about to run, on the attached backend (a
    # miscompiled kernel can run fine and decode nothing —
    # wideband/selftest.py; CLI equivalent: `wideband --selftest`).
    # One extra compile, ~3.5 ms of air.
    from btle_tpu.wideband import fused_selftest

    if cfg.fused:
        fused_selftest(compute_dtype=cfg.fused_dtype, tile=cfg.fused_tile)
    else:
        fused_selftest(pipeline="xla")
    print("self-test: OK")

    wb = WidebandSniffer(cfg)
    pdu = B.bytes_to_bits(np.array([0x42, 6, 1, 2, 3, 4, 5, 6], np.uint8))
    sig = G.gfsk_modulate_float(G.assemble_phy_bits(pdu, 17), 80)
    wi, wq = synthesize_wideband({17: sig}, 170000, {17: 11000})
    pkts = wb.process(wi, wq)
    got = [(p.channel, p.crc_ok) for p in pkts]
    print(f"wideband ({'fused ' + cfg.fused_dtype if cfg.fused else 'XLA'}"
          f" path) decoded: {got}")
    assert any(ch == 17 and ok for ch, ok in got)

    # ---- 4. the flagship LIVE loop: ring -> pipelined wideband scans
    # -> NDJSON (what `wideband --live --udp N --json` runs forever).
    # Here the ring is filled in-process with the same scene; a real
    # deployment attaches runtime.UdpIngest (see tools/bench_live_tpu.py
    # for the measured sustained-rate figures). scan_async/consume_scan
    # keep `pipeline` blocks in flight so the host result fetch hides
    # behind the next block's device compute.
    if runtime.available():
        import io
        import json

        from btle_tpu.stream import NdjsonEmitter
        from btle_tpu.wideband.stream import WidebandStreamRunner

        live_ring = runtime.IqRingBuffer(1 << 22)
        step = cfg.scan_len_ch * 20
        halo = WidebandSniffer(cfg).halo_ch * 20
        n_live = 2 * step + halo + 1024     # two blocks + lookahead
        pi = np.zeros(n_live, np.float32)
        pq = np.zeros(n_live, np.float32)
        pi[: len(wi)] = wi
        pq[: len(wq)] = wq
        inter = np.empty(2 * n_live, np.int16)
        inter[0::2] = np.clip(np.round(pi * 256), -32768, 32767)
        inter[1::2] = np.clip(np.round(pq * 256), -32768, 32767)
        live_ring.write(inter, "i16")
        out = io.StringIO()
        runner = WidebandStreamRunner(WidebandSniffer(cfg),
                                      ndjson=NdjsonEmitter(out))
        stats = runner.run_live(
            live_ring,
            should_stop=lambda: live_ring.available_pairs < step + halo,
            pipeline=2, scale=1.0 / 256)
        evs = [json.loads(ln) for ln in out.getvalue().splitlines()]
        live_pkts = [e for e in evs if e["t"] == "pkt" and e["crc_ok"]]
        print(f"live loop: {stats.blocks} blocks, {len(live_pkts)} NDJSON "
              f"packets, {stats.dropped_pairs} ring drops")
        assert live_pkts and live_pkts[0]["ch"] == 17
        live_ring.close()
    print("production deployment walkthrough: PASS")


if __name__ == "__main__":
    main()
