"""Streaming runtime tests: overlap-save blocks, pcap round-trip, NDJSON
schema, and the end-to-end sniffer on synthetic multi-packet streams and
the real capture."""

import io
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.ll import AdvPduType
from btle_tpu.spec import bits as B
from btle_tpu.stream import (
    NdjsonEmitter,
    OverlapBlockIterator,
    PcapWriter,
    Sniffer,
    SnifferConfig,
    array_source,
    iq_file_source,
    read_pcap,
)

from test_golden import USRP_BIN, load_usrp_capture


def make_adv_stream(pdus, gap, rng, sps=4):
    segs = []
    for pdu_bits in pdus:
        ci, cq, _ = G.btle_tx(pdu_bits, 37, sps=sps, flavor="c")
        segs.append(np.stack([ci, cq]).astype(np.int16))
        segs.append(rng.integers(-2, 3, (2, gap)).astype(np.int16))
    s = np.concatenate(segs, axis=1)
    return s[0], s[1]


def make_adv_pdu(rng, n_payload, pdu_type=0):
    payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
    hdr = np.array([pdu_type, n_payload], dtype=np.uint8)
    return B.bytes_to_bits(np.concatenate([hdr, payload]))


class TestBlocks:
    def test_blocks_cover_stream(self, rng):
        i = rng.integers(-100, 100, 20000).astype(np.int16)
        q = rng.integers(-100, 100, 20000).astype(np.int16)
        it = OverlapBlockIterator(array_source(i, q, 3000), sps=4, lag=1, scan_len=4096)
        covered = 0
        shapes = set()
        for b in it:
            assert b.offset == covered
            covered += b.scan_len
            shapes.add(len(b.i))
            np.testing.assert_array_equal(b.i[: min(b.scan_len, 20000 - b.offset)],
                                          i[b.offset : b.offset + b.scan_len])
        assert covered >= 20000
        assert len(shapes) == 1  # constant shape -> one jit compilation


class TestPcap:
    def test_roundtrip(self, tmp_path):
        path = tmp_path / "x.pcap"
        with PcapWriter(path) as w:
            w.write_packet(b"\x42\x06" + bytes(6), 37, 0x8E89BED6, rssi_dbm=-60, ts=123.5)
            w.write_packet(b"\x01\x00", 9, 0x60850A1B, ts=124.0)
        recs = read_pcap(path)
        assert len(recs) == 2
        assert recs[0].channel == 37
        assert recs[0].access_addr == 0x8E89BED6
        assert recs[0].rssi_dbm == -60
        assert recs[0].packet == b"\x42\x06" + bytes(6)
        assert recs[1].channel == 9
        assert recs[1].rssi_dbm == -127  # unknown

    def test_reference_header_bytes(self, tmp_path):
        path = tmp_path / "h.pcap"
        PcapWriter(path).close()
        hdr = open(path, "rb").read()
        # exact global header the C tool writes (btle_rx.c:110-111)
        assert hdr == bytes.fromhex("a1b2c3d4000200040000000000000000000005dc00000100")


class TestNdjson:
    def test_pkt_adv_schema(self):
        buf = io.StringIO()
        em = NdjsonEmitter(buf)
        em.pkt_adv(1715680000.1, 42, 37, 0x8E89BED6, True, 0, "ADV_IND", 1, 0,
                   31, bytes.fromhex("aabbccddeeff"), b"\x02\x01\x1a", -58)
        obj = json.loads(buf.getvalue())
        assert obj["v"] == 1 and obj["t"] == "pkt" and obj["kind"] == "adv"
        assert obj["aa"] == "8e89bed6"
        assert obj["adv_a"] == "aa:bb:cc:dd:ee:ff"
        assert obj["payload_hex"] == "02011a"
        assert obj["rssi_est"] == -58

    def test_hop_schema(self):
        buf = io.StringIO()
        em = NdjsonEmitter(buf)
        em.hop(1.0, "track_start", 0, 1, 9, 2422, 0x60850A1B, 0xA77B22,
               100000, 9, bytes.fromhex("1fffffffff"))
        obj = json.loads(buf.getvalue())
        assert obj["event"] == "track_start"
        assert obj["crc_init"] == "a77b22"
        assert obj["chm"] == "1fffffffff"


class TestSniffer:
    def test_multi_packet_sniff_with_outputs(self, rng, tmp_path):
        pdus = [make_adv_pdu(rng, n) for n in (6, 15, 37, 8, 22)]
        i, q = make_adv_stream(pdus, 3000, rng)
        buf = io.StringIO()
        pcap_path = tmp_path / "out.pcap"
        cfg = SnifferConfig(channel=37, sps=4, rssi=True)
        sn = Sniffer(cfg, ndjson=NdjsonEmitter(buf), pcap=PcapWriter(pcap_path),
                     quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 5
        for e, pdu_bits in zip(ok, pdus):
            exp = B.bits_to_bytes(pdu_bits)
            assert e.header.payload_len == len(exp) - 2
            np.testing.assert_array_equal(
                np.frombuffer(e.payload_bytes, dtype=np.uint8), exp[2:]
            )
        lines = [json.loads(l) for l in buf.getvalue().splitlines()]
        assert sum(1 for l in lines if l["t"] == "pkt" and l["crc_ok"]) == 5
        recs = read_pcap(pcap_path)
        assert len(recs) == len(events)
        assert all(r.rssi_dbm > -127 for r in recs)

    def test_block_boundary_packet(self, rng):
        """A packet straddling the scan boundary must decode exactly once."""
        pdu = make_adv_pdu(rng, 37)
        ci, cq, _ = G.btle_tx(pdu, 37, sps=4, flavor="c")
        scan_len = 4096
        pre = scan_len - len(ci) // 2  # packet starts near end of block 0
        i = np.concatenate([np.zeros(pre, np.int16), ci, np.zeros(6000, np.int16)])
        q = np.concatenate([np.zeros(pre, np.int16), cq, np.zeros(6000, np.int16)])
        cfg = SnifferConfig(channel=37, sps=4, scan_len=scan_len)
        sn = Sniffer(cfg, quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1
        np.testing.assert_array_equal(
            np.frombuffer(ok[0].payload_bytes, dtype=np.uint8),
            B.bits_to_bytes(pdu)[2:],
        )

    def test_pdu_type_filter(self, rng):
        pdus = [make_adv_pdu(rng, 10, pdu_type=0), make_adv_pdu(rng, 10, pdu_type=2)]
        i, q = make_adv_stream(pdus, 2000, rng)
        cfg = SnifferConfig(channel=37, sps=4, filter_pdu_mask=1 << 2)
        sn = Sniffer(cfg, quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1
        assert ok[0].header.pdu_type == AdvPduType.ADV_NONCONN_IND

    def test_adva_filter(self, rng):
        def pdu_with_adva(adva_hex):
            payload = np.frombuffer(bytes.fromhex(adva_hex)[::-1], dtype=np.uint8)
            payload = np.concatenate([payload, rng.integers(0, 256, 4, dtype=np.uint8)])
            hdr = np.array([0x00, len(payload)], dtype=np.uint8)
            return B.bytes_to_bits(np.concatenate([hdr, payload]))

        pdus = [pdu_with_adva("010203040506"), pdu_with_adva("aabbccddeeff")]
        i, q = make_adv_stream(pdus, 2000, rng)
        cfg = SnifferConfig(channel=37, sps=4,
                            filter_adva=bytes.fromhex("aabbccddeeff"))
        sn = Sniffer(cfg, quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1

    def test_usrp_capture_file(self):
        from btle_tpu.stream import sniff_file

        events = sniff_file(USRP_BIN, fmt="f32", channel=37, sps=4)
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1
        assert ok[0].payload_bytes[7] == 0x09  # local-name AD type


class TestAllZeroMaskStall:
    def test_zero_access_mask_terminates(self):
        """Adversarial input for the stall guard (rx/decoder.py): an
        all-zero access mask makes EVERY lattice position an AA hit, so
        candidate slots exhaust on every rescan. The scan must still
        terminate with the cursor covering the territory."""
        from btle_tpu.rx.decoder import stream_decode

        rng = np.random.default_rng(7)
        n = 4096
        i = rng.integers(-80, 80, n).astype(np.int16)
        q = rng.integers(-80, 80, n).astype(np.int16)
        res = stream_decode(i, q, channel=37, aa_mask_hex="00000000",
                            sps=4, max_candidates=4)
        # every hit either became a packet or a rejected header; the
        # consumed cursor must reach the end minus at most one maximum
        # packet span (a final packet crossing the block edge is deferred)
        max_span = (32 + 16) * 4 + (37 + 3) * 8 * 4
        assert res.consumed >= n - 1 - max_span
        assert res.num_hits > 4
        assert len(res.packets) + len(res.bad_headers) > 0
