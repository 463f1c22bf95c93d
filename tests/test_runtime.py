"""Native runtime tests: ring buffer semantics, format conversion, UDP
ingest, and an end-to-end ring -> sniffer decode."""

import socket
import time

import numpy as np
import pytest

runtime = pytest.importorskip("btle_tpu.runtime")

if not runtime.available():
    pytest.skip("native runtime not built (no g++)", allow_module_level=True)


class TestRing:
    def test_write_read_block_overlap(self):
        ring = runtime.IqRingBuffer(1 << 12)
        data = np.arange(2000, dtype=np.int16)
        inter = np.empty(4000, dtype=np.int16)
        inter[0::2] = data
        inter[1::2] = -data
        assert ring.write(inter, "i16") == 2000
        assert ring.available_pairs == 2000

        blk = ring.read_block(1000, 200)
        assert blk is not None
        i, q = blk
        np.testing.assert_array_equal(i, data[:1200])
        np.testing.assert_array_equal(q, -data[:1200])
        # overlap-save: only 1000 consumed
        assert ring.available_pairs == 1000
        blk2 = ring.read_block(1000, 200)
        assert blk2 is None  # needs 1200, only 1000 left
        ti, tq = ring.drain()
        np.testing.assert_array_equal(ti, data[1000:])

    def test_overflow_counts_drops(self):
        ring = runtime.IqRingBuffer(1024)
        inter = np.zeros(2 * 5000, dtype=np.int16)
        ring.write(inter, "i16")
        assert ring.dropped > 0
        assert ring.available_pairs <= 1024

    def test_f32_scaling(self):
        ring = runtime.IqRingBuffer(1 << 10)
        inter = np.array([0.49609375, -0.49609375, 0.25, 0.0], dtype=np.float32)
        ring.write(inter, "f32", scale=256.0)
        i, q = ring.drain()
        np.testing.assert_array_equal(i, [127, 64])
        np.testing.assert_array_equal(q, [-127, 0])


class TestDeinterleave:
    @pytest.mark.parametrize("fmt,dtype", [("i8", np.int8), ("i16", np.int16)])
    def test_int_formats(self, fmt, dtype, rng):
        inter = rng.integers(-100, 100, 4096).astype(dtype)
        i, q = runtime.deinterleave(inter, fmt)
        np.testing.assert_array_equal(i, inter[0::2].astype(np.int16))
        np.testing.assert_array_equal(q, inter[1::2].astype(np.int16))

    def test_f32(self, rng):
        inter = (rng.normal(0, 0.2, 2048)).astype(np.float32)
        i, q = runtime.deinterleave(inter, "f32", scale=256.0)
        np.testing.assert_array_equal(i, np.round(inter[0::2] * 256).astype(np.int16))


class TestUdp:
    def test_udp_ingest(self):
        ring = runtime.IqRingBuffer(1 << 16)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        src = runtime.UdpIngest(ring, port, "i16")
        try:
            payload = np.arange(512, dtype=np.int16).tobytes()
            sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for _ in range(4):
                sock.sendto(payload, ("127.0.0.1", port))
            deadline = time.time() + 3
            while src.datagrams < 4 and time.time() < deadline:
                time.sleep(0.01)
            assert src.datagrams == 4
            assert ring.available_pairs == 4 * 256  # 1024B datagram = 256 IQ pairs
            i, q = ring.drain()
            np.testing.assert_array_equal(i[:4], [0, 2, 4, 6])
        finally:
            src.stop()


class TestEndToEnd:
    def test_ring_to_sniffer(self, rng):
        jax = pytest.importorskip("jax")
        from btle_tpu.golden import model as G
        from btle_tpu.spec import bits as B
        from btle_tpu.stream import Sniffer, SnifferConfig

        payload = rng.integers(0, 256, 15, dtype=np.uint8)
        pdu = B.bytes_to_bits(
            np.concatenate([[0x40, len(payload)], payload]).astype(np.uint8))
        ci, cq, _ = G.btle_tx(pdu, 37, sps=4, flavor="c")
        inter = np.zeros(2 * (len(ci) + 2000), dtype=np.int16)
        inter[2000::2] = np.concatenate([ci, np.zeros(1000, np.int8)])[: len(inter[2000::2])]
        inter[2001::2] = np.concatenate([cq, np.zeros(1000, np.int8)])[: len(inter[2001::2])]

        ring = runtime.IqRingBuffer(1 << 16)
        ring.write(inter, "i16")
        done = {"v": False}
        src = runtime.ring_source(ring, 4096, 1500, stop=lambda: done["v"])
        done["v"] = True
        sn = Sniffer(SnifferConfig(channel=37, sps=4, scan_len=4096), quiet_text=True)
        events = sn.run(src)
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1
        np.testing.assert_array_equal(
            np.frombuffer(ok[0].payload_bytes, np.uint8), B.bits_to_bytes(pdu)[2:])


class TestUdpTransmit:
    def test_timed_burst_loopback(self, rng):
        """TX burst scheduler over the wire (btle_tx tx_one_buf analog):
        synthesize a 2-packet plan, play it to UDP in wire format, ingest
        through the native ring, decode both packets back."""
        jax = pytest.importorskip("jax")
        from btle_tpu.stream import Sniffer, SnifferConfig
        from btle_tpu.tx import synthesize
        from btle_tpu.tx.descriptor import parse_descriptor
        from btle_tpu.tx.playback import NUM_PRE_SEND_ZEROS, udp_transmit

        specs = [
            parse_descriptor("37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-0a0b0c0d0e0f"
                             "-AdvData-0201060709546573747932-Space-2"),
            parse_descriptor("37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-102030405060"
                             "-AdvData-020106-Space-1"),
        ]
        pkts = synthesize(specs, flavor="c", sps=4)
        for p in pkts:
            p.i = p.i.astype(np.int16) * 32
            p.q = p.q.astype(np.int16) * 32

        ring = runtime.IqRingBuffer(1 << 18)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        src = runtime.UdpIngest(ring, port, "i16")
        try:
            sent = udp_transmit(pkts, port, sps=4, num_repeat=2)
            expect = 2 * sum(
                NUM_PRE_SEND_ZEROS + len(p.i) + p.spec.space_ms * 4000
                for p in pkts)
            assert sent == expect
            deadline = time.time() + 5
            while ring.available_pairs < sent and time.time() < deadline:
                time.sleep(0.01)
            assert ring.available_pairs == sent, "datagrams lost in loopback"
            i, q = ring.drain()
        finally:
            src.stop()

        sn = Sniffer(SnifferConfig(channel=37, scan_len=8192), quiet_text=True)
        events = sn.run(iter([(i, q)]))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 4  # 2 packets x 2 repeats
        assert ok[0].payload.adv_a == bytes.fromhex("0a0b0c0d0e0f")
        assert ok[1].payload.adv_a == bytes.fromhex("102030405060")

    def test_realtime_materializes_space_gaps(self):
        """realtime=True must send the Space silence as zero samples too:
        the receive side's clock is the sample offset, so skipping the
        gap (an earlier bug: plain time.sleep) compresses advert
        intervals and hop timing."""
        from btle_tpu.tx import synthesize
        from btle_tpu.tx.descriptor import parse_descriptor
        from btle_tpu.tx.playback import NUM_PRE_SEND_ZEROS, udp_transmit

        pkts = synthesize(
            [parse_descriptor("37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-0a0b0c0d0e0f"
                              "-AdvData-020106-Space-1")],
            flavor="c", sps=4)
        sink = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sink.bind(("127.0.0.1", 0))
        port = sink.getsockname()[1]
        try:
            sent = udp_transmit(pkts, port, sps=4, num_repeat=1,
                                realtime=True)
        finally:
            sink.close()
        expect = sum(NUM_PRE_SEND_ZEROS + len(p.i) + p.spec.space_ms * 4000
                     for p in pkts)
        assert sent == expect


@pytest.mark.perf
def test_ring_sustains_wideband_rate():
    """The SPSC ring must beat the 80 Msps wideband ingest rate on even a
    weak host (the round-2 wrap-split memcpy rewrite took this container
    from 25 to ~420 Mpairs/s; per-element masked indexing defeats
    vectorization). The floor is 40 Mpairs/s — far below the ~420
    measured headroom but above the 25 of the defeated-vectorization
    regression this guards against; deselect perf floors entirely on
    loaded CI hosts with `-m "not perf"`."""
    import time

    from btle_tpu import runtime as rt

    if not rt.available():
        pytest.skip("native runtime unavailable")
    ring = rt.IqRingBuffer(1 << 22)
    slab = np.random.default_rng(0).integers(-2000, 2000, 1 << 21).astype(np.int16)
    scan, halo = 655360, 29473
    # best of 3 trials: a perf floor on a 2-core host is vulnerable to
    # transient co-tenant load; the capability being asserted is the
    # ring's speed, not the machine's idleness
    best = 0.0
    for _ in range(3):
        total = 0
        t0 = time.perf_counter()
        for _ in range(20):
            total += ring.write(slab, fmt="i16")
            while ring.available_pairs >= scan + halo:
                ring.read_block(scan, halo)
        best = max(best, total / (time.perf_counter() - t0) / 1e6)
        if best >= 40.0:
            break
    ring.close()
    assert best >= 40.0, f"{best:.0f} Mpairs/s < regression floor"
