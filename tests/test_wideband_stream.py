"""Wideband NDJSON streaming + live ring ingest (WidebandStreamRunner).

The reference's flagship mode is the unbounded live loop with `--json`
events feeding the btle_cli application layer (btle_rx.c:2610-2676,
btle_json.h:5-40). These tests pin the TPU framework's equivalents:
schema-v1 events from the 40-channel path (consumed by the SAME
aggregate/recon machinery as the narrowband stream), truncation
surfacing as status events, and the ring-driven pipelined live loop.
"""

import io
import json
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.stream.ndjson import NdjsonEmitter
from btle_tpu.wideband import WidebandConfig, WidebandSniffer, synthesize_wideband
from btle_tpu.wideband.stream import WidebandStreamRunner

from test_hop import CONN_AA, CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu
from test_system import adv_ind, burst


def _scene(rng, n):
    """ADV on 37/38, a CONNECT_REQ forming a connection, and one data
    packet on the connection's first hop channel (9, per connect_req_pdu's
    hop pattern as exercised by test_system)."""
    wi = np.zeros(n, np.float32)
    wq = np.zeros(n, np.float32)
    pdus = {
        37: adv_ind("aabbccddeeff", b"SensorTag"),
        38: adv_ind("102030405060", b"Beacon-X", bytes([0x4C, 0x00, 2, 21])),
    }
    for k, (ch, pdu) in enumerate(pdus.items()):
        si, sq = synthesize_wideband({ch: burst(pdu, ch)}, n,
                                     {ch: 10_000 + 30_000 * k})
        wi += si
        wq += sq
    si, sq = synthesize_wideband({37: burst(connect_req_pdu(), 37)}, n,
                                 {37: 120_000})
    wi += si
    wq += sq
    data = B.bytes_to_bits(np.frombuffer(b"\x01\x05hello", np.uint8))
    si, sq = synthesize_wideband(
        {9: burst(data, 9, crc_init_hex=CRC_INIT_HEX,
                  access_address_hex=CONN_AA_HEX)},
        n, {9: 8192 * 20 + 40_000})
    wi += si
    wq += sq
    wi += rng.normal(0, 0.01, n).astype(np.float32)
    wq += rng.normal(0, 0.01, n).astype(np.float32)
    return wi, wq


class TestNdjson:
    def test_schema_v1_events_and_app_layer(self, rng):
        n = 2 * 8192 * 20
        wi, wq = _scene(rng, n)
        out = io.StringIO()
        sn = WidebandSniffer(WidebandConfig(follow_connections=True))
        runner = WidebandStreamRunner(sn, ndjson=NdjsonEmitter(out))
        runner.start()
        pkts = runner.run_capture(wi, wq)
        runner.stop()
        assert any(p.crc_ok for p in pkts)

        lines = out.getvalue().splitlines()
        objs = [json.loads(ln) for ln in lines]          # every line is JSON
        assert all(o["v"] == 1 for o in objs)
        kinds = {(o["t"], o.get("kind")) for o in objs}
        assert ("pkt", "adv") in kinds and ("pkt", "data") in kinds
        assert ("status", None) in kinds and ("hop", None) in kinds
        hop = [o for o in objs if o["t"] == "hop"]
        assert hop[0]["event"] == "track_start"
        assert hop[0]["aa"] == f"{CONN_AA:08x}"
        st = [o for o in objs if o["t"] == "status"]
        assert [s["event"] for s in st][:1] == ["start"]
        assert st[-1]["event"] == "stop"

        # the SAME app layer the narrowband stream feeds: parse_line ->
        # ScanAggregator -> quickscan sees the advertisers
        from btle_tpu.cli.aggregate import ScanAggregator
        from btle_tpu.cli.events import parse_line
        from btle_tpu.cli.recon import quickscan

        agg = ScanAggregator()
        parsed = 0
        for ln in lines:
            ev = parse_line(ln)
            assert ev is not None, ln
            parsed += 1
            if getattr(ev, "t", None) == "pkt":
                agg.update(ev)
        assert parsed == len(lines)
        s = quickscan(agg)
        assert s.n_devices >= 2

    def test_truncation_surfaces_as_status(self, rng):
        # more packets in one channel than candidate slots: the rescan
        # recovers them AND a status event surfaces the truncation
        from test_wideband import make_channel_burst

        bursts, gap = [], np.zeros(6000, np.float32)
        for _ in range(8):
            (bi, bq), _ = make_channel_burst(rng, 9, n_payload=6)
            bursts.append((bi, bq))
        sig_i = np.concatenate([x for b in bursts for x in (b[0], gap)])
        sig_q = np.concatenate([x for b in bursts for x in (b[1], gap)])
        n = len(sig_i) + 120000
        wi, wq = synthesize_wideband({9: (sig_i, sig_q)}, n, {9: 4000})

        out = io.StringIO()
        sn = WidebandSniffer(WidebandConfig(max_candidates=2))
        runner = WidebandStreamRunner(sn, ndjson=NdjsonEmitter(out))
        pkts = runner.run_capture(wi, wq)
        assert sum(p.crc_ok for p in pkts) == 8          # rescan recovered
        trunc = [json.loads(ln) for ln in out.getvalue().splitlines()
                 if json.loads(ln).get("event") == "truncate"]
        assert trunc and "rescan" in trunc[-1]["msg"]
        assert runner.stats.truncate_rescans == sn.truncated_channels > 0


class TestLiveRing:
    @pytest.mark.parametrize("pipeline", [1, 3])
    def test_ring_loop_decodes_scene(self, rng, pipeline):
        runtime = pytest.importorskip("btle_tpu.runtime")
        if not runtime.available():
            pytest.skip("native runtime unavailable")
        cfg = WidebandConfig(scan_len_ch=8192)
        n = 3 * cfg.scan_len_ch * 20
        wi, wq = _scene(rng, n)
        # int16 wire format, like a real SDR producer
        inter = np.empty(2 * n, np.int16)
        inter[0::2] = np.clip(np.round(wi * 256), -32768, 32767)
        inter[1::2] = np.clip(np.round(wq * 256), -32768, 32767)

        ring = runtime.IqRingBuffer(1 << 24)
        assert ring.write(inter, "i16") == n

        sn = WidebandSniffer(cfg)
        out = io.StringIO()
        runner = WidebandStreamRunner(sn, ndjson=NdjsonEmitter(out))
        step = cfg.scan_len_ch * 20
        halo = sn.halo_ch * 20
        stats = runner.run_live(
            ring, should_stop=lambda: ring.available_pairs < step + halo,
            pipeline=pipeline, scale=1.0 / 256)
        assert stats.blocks >= 2
        assert stats.dropped_pairs == 0
        objs = [json.loads(ln) for ln in out.getvalue().splitlines()]
        got = {(o["ch"], o["payload_hex"]) for o in objs
               if o["t"] == "pkt" and o["crc_ok"]}
        assert any(ch == 37 for ch, _ in got)
        assert any(ch == 38 for ch, _ in got)
        ring.close()


class TestCliLive:
    def test_wideband_json_cli(self, tmp_path, rng):
        n = 8192 * 20 * 2
        wi, wq = _scene(rng, n)
        inter = np.empty(2 * n, np.float32)
        inter[0::2] = wi
        inter[1::2] = wq
        f = tmp_path / "air.bin"
        inter.tofile(f)
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "wideband", "--bin", str(f),
             "--json", "--follow"],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        objs = [json.loads(ln) for ln in r.stdout.splitlines()]
        assert objs and all(o["v"] == 1 for o in objs)
        assert any(o["t"] == "hop" for o in objs)
        assert "Msps" in r.stderr

    def test_wideband_live_udp_cli(self, tmp_path, rng):
        """End-to-end live chain: UDP datagrams -> native ring ->
        pipelined wideband scan -> NDJSON, via the CLI."""
        runtime = pytest.importorskip("btle_tpu.runtime")
        if not runtime.available():
            pytest.skip("native runtime unavailable")
        import socket
        import time as _time

        n = 8192 * 20 * 2
        wi, wq = _scene(rng, n)
        inter = np.empty(2 * n, np.int16)
        inter[0::2] = np.clip(np.round(wi * 256), -32768, 32767)
        inter[1::2] = np.clip(np.round(wq * 256), -32768, 32767)
        port = 47123
        proc = subprocess.Popen(
            [sys.executable, "-m", "btle_tpu", "wideband", "--live",
             "--udp", str(port), "--format", "i16", "--json",
             "--seconds", "25"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        try:
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            _time.sleep(2.0)           # listener + jit warm-up
            raw = inter.tobytes()
            chunk = 32768              # pairs per datagram * 4 bytes
            deadline = _time.monotonic() + 60
            for off in range(0, len(raw), chunk):
                sock.sendto(raw[off : off + chunk], ("127.0.0.1", port))
                _time.sleep(0.001)
                assert _time.monotonic() < deadline
            out, err = proc.communicate(timeout=120)
        finally:
            proc.kill()
        assert proc.returncode == 0, err
        objs = [json.loads(ln) for ln in out.splitlines()]
        got = {o["ch"] for o in objs if o["t"] == "pkt" and o["crc_ok"]}
        assert 37 in got or 38 in got, (out[:2000], err[:2000])


class TestLiveFollow:
    def test_live_loop_follows_connection(self, rng):
        """CONNECT_REQ in an early block re-keys the data channels for
        later blocks THROUGH the live ring loop (pipeline=1 keeps the
        re-key same-cadence as the file path; deeper pipelines lag by
        depth-1 blocks, documented)."""
        runtime = pytest.importorskip("btle_tpu.runtime")
        if not runtime.available():
            pytest.skip("native runtime unavailable")
        from test_hop import CONN_AA, CONN_AA_HEX, CRC_INIT_HEX

        from btle_tpu.golden import model as G

        cfg = WidebandConfig(scan_len_ch=8192, follow_connections=True)
        block = cfg.scan_len_ch * 20
        n = 3 * block
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        si, sq = synthesize_wideband({37: burst(connect_req_pdu(), 37)}, n,
                                     {37: 30_000})
        wi += si
        wq += sq
        data = B.bytes_to_bits(np.frombuffer(b"\x01\x05live!", np.uint8))
        si, sq = synthesize_wideband(
            {9: burst(data, 9, crc_init_hex=CRC_INIT_HEX,
                      access_address_hex=CONN_AA_HEX)},
            n, {9: 2 * block + 40_000})
        wi += si
        wq += sq

        # trailing quiet air so the LAST content block still has a full
        # block+halo available when the stop condition is polled
        pad = block
        inter = np.zeros(2 * (n + pad), np.int16)
        inter[0 : 2 * n : 2] = np.clip(np.round(wi * 256), -32768, 32767)
        inter[1 : 2 * n : 2] = np.clip(np.round(wq * 256), -32768, 32767)
        ring = runtime.IqRingBuffer(1 << 24)
        assert ring.write(inter, "i16") == n + pad

        sn = WidebandSniffer(cfg)
        out = io.StringIO()
        runner = WidebandStreamRunner(sn, ndjson=NdjsonEmitter(out))
        halo = sn.halo_ch * 20
        runner.run_live(
            ring, should_stop=lambda: ring.available_pairs < block + halo,
            pipeline=1, scale=1.0 / 256)
        objs = [json.loads(ln) for ln in out.getvalue().splitlines()]
        hops = [o for o in objs if o["t"] == "hop"]
        assert hops and hops[0]["event"] == "track_start"
        data_pkts = [o for o in objs if o.get("kind") == "data"
                     and o["crc_ok"] and o["ch"] == 9]
        assert data_pkts
        assert data_pkts[0]["aa"] == f"{CONN_AA:08x}"
        assert data_pkts[0]["payload_hex"] == b"live!".hex()
        ring.close()
