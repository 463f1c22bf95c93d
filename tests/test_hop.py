"""Connection hop-following end-to-end (the reference's unique capability,
SURVEY.md 3.4): ADV -> CONNECT_REQ -> timed data-channel hops, simulated on
the sample clock; plus the wideband follower that listens to all data
channels at once."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.stream import Sniffer, SnifferConfig, array_source
from btle_tpu.wideband import WidebandConfig, WidebandSniffer, synthesize_wideband

CONN_AA_HEX = "1b0a8560"          # on-air order of AA 0x60850A1B
CONN_AA = 0x60850A1B
CRC_INIT_HEX = "a77b22"


def connect_req_pdu(hop=9, interval=16):
    payload = (
        bytes.fromhex("001830EA965F")[::-1]           # InitA
        + bytes.fromhex("90D7EBB19299")[::-1]         # AdvA
        + CONN_AA.to_bytes(4, "little")
        + bytes.fromhex(CRC_INIT_HEX)
        + bytes([0x02])
        + (0x000F).to_bytes(2, "little")
        + interval.to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + (0x07D0).to_bytes(2, "little")
        + bytes.fromhex("1FFFFFFFFF")[::-1]
        + bytes([hop | (5 << 5)])
    )
    hdr = bytes([0x05, len(payload)])
    return B.bytes_to_bits(np.frombuffer(hdr + payload, np.uint8))


def data_pdu(rng, n=8):
    payload = rng.integers(0, 256, n, dtype=np.uint8)
    return B.bytes_to_bits(
        np.concatenate([[0x01, n], payload]).astype(np.uint8))


def place(buf_i, buf_q, pos, ci, cq):
    buf_i[pos : pos + len(ci)] = ci
    buf_q[pos : pos + len(cq)] = cq


class TestSingleChannelHopFollow:
    def test_follow_two_hops(self, rng):
        """Simulates what a retuning receiver sees: ch37 ADV + CONNECT_REQ,
        then data-channel content matching the FSM's hop sequence
        (9 -> 18 with hop=9, interval 16 * 1.25 ms)."""
        sps = 4
        n = 120_000
        i = np.zeros(n, np.int16)
        q = np.zeros(n, np.int16)

        # ch37 segment
        ci, cq, _ = G.btle_tx(connect_req_pdu(), 37, sps=sps, flavor="c")
        place(i, q, 10_000, ci, cq)

        d1 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d1, 9, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps, flavor="c")
        place(i, q, 36_000, ci, cq)   # t = 9000 us, first data dwell (ch 9)

        d2 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d2, 18, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps, flavor="c")
        place(i, q, 96_000, ci, cq)   # t = 24000 us, after the timed hop

        sn = Sniffer(SnifferConfig(channel=37, sps=sps, hop=True), quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 3
        assert ok[0].channel == 37 and int(ok[0].header.pdu_type) == 5
        assert ok[1].channel == 9
        np.testing.assert_array_equal(
            np.frombuffer(ok[1].payload_bytes, np.uint8), B.bits_to_bytes(d1)[2:])
        assert ok[2].channel == 18
        np.testing.assert_array_equal(
            np.frombuffer(ok[2].payload_bytes, np.uint8), B.bits_to_bytes(d2)[2:])
        # receiver state carries the sniffed link parameters
        assert sn.access_addr == CONN_AA
        t = sn.hop_tracker
        assert t.hop == 9 and t.interval_us == 16 * 1250
        assert [e.event for e in t.events][:2] == ["track_start", "chan_change"]

    def test_partial_channel_map_followed_via_csa1(self, rng):
        """Beyond-reference E2E: a CONNECT_REQ masking data channel 9
        still tracks — CSA#1 remaps the first unmapped channel (9) onto
        used[9 % 36] = channel 10, and the data packet placed THERE
        decodes (the reference drops any partial map, btle_rx.c:2417)."""
        sps = 4
        pdu_bits = connect_req_pdu()
        pdu = B.bits_to_bytes(pdu_bits)
        pdu[2 + 29] = 0xFD  # chm on-air byte 1 (ch 8-15): mask channel 9
        pdu_bits = B.bytes_to_bits(pdu)
        ci, cq, _ = G.btle_tx(pdu_bits, 37, sps=sps, flavor="c")
        i = np.zeros(60_000, np.int16)
        q = np.zeros(60_000, np.int16)
        place(i, q, 5_000, ci, cq)
        d1 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d1, 10, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps,
                              flavor="c")
        place(i, q, 36_000, ci, cq)
        sn = Sniffer(SnifferConfig(channel=37, sps=sps, hop=True),
                     quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 2
        assert ok[1].channel == 10
        np.testing.assert_array_equal(
            np.frombuffer(ok[1].payload_bytes, np.uint8),
            B.bits_to_bytes(d1)[2:])
        t = sn.hop_tracker
        assert t.hop_chan == 9 and t.channel == 10
        assert [e.event for e in t.events][:1] == ["track_start"]

    def test_channel_map_update_keeps_follow_alive(self, rng):
        """Beyond-reference E2E: a sniffed LL_CHANNEL_MAP_REQ masking the
        NEXT hop channel (18) re-keys the live follow at its instant, so
        the next dwell lands on the CSA#1 remap (19) and decodes — the
        reference parses the opcode but never applies it
        (btle_rx.c:1797-1811), so its follow dies right here."""
        sps = 4
        n = 120_000
        i = np.zeros(n, np.int16)
        q = np.zeros(n, np.int16)
        ci, cq, _ = G.btle_tx(connect_req_pdu(), 37, sps=sps, flavor="c")
        place(i, q, 10_000, ci, cq)
        # ch9 dwell: LL_CHANNEL_MAP_REQ, chm masks ch 18, instant 1
        # (on-air: opcode 01 + chm LE [FF FF FB FF 1F] + instant 0100)
        ctrl = np.array([0x03, 8, 0x01, 0xFF, 0xFF, 0xFB, 0xFF, 0x1F,
                         0x01, 0x00], np.uint8)
        ci, cq, _ = G.btle_tx(B.bytes_to_bits(ctrl), 9,
                              crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps,
                              flavor="c")
        place(i, q, 36_000, ci, cq)   # t = 9000 us, first data dwell
        d2 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d2, 19, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps,
                              flavor="c")
        place(i, q, 96_000, ci, cq)   # t = 24000 us: post-update dwell
        sn = Sniffer(SnifferConfig(channel=37, sps=sps, hop=True),
                     quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 3
        assert ok[1].channel == 9     # the map-update packet itself
        assert ok[2].channel == 19    # remapped dwell (18 is masked)
        np.testing.assert_array_equal(
            np.frombuffer(ok[2].payload_bytes, np.uint8),
            B.bits_to_bytes(d2)[2:])
        t = sn.hop_tracker
        assert 18 not in t.used
        assert any(e.event == "chm_update" for e in t.events)

    def test_partial_map_reference_gate_opt_in(self, rng):
        """require_full_map=True restores the reference's refusal."""
        sps = 4
        pdu = B.bits_to_bytes(connect_req_pdu())
        pdu[2 + 28] = 0xFE
        ci, cq, _ = G.btle_tx(B.bytes_to_bits(pdu), 37, sps=sps, flavor="c")
        i = np.zeros(30_000, np.int16)
        q = np.zeros(30_000, np.int16)
        place(i, q, 5_000, ci, cq)
        sn = Sniffer(SnifferConfig(channel=37, sps=sps, hop=True),
                     quiet_text=True)
        sn.hop_tracker.require_full_map = True
        events = sn.run(array_source(i, q))
        assert any(e.crc_ok for e in events)
        assert sn.channel == 37                      # no retune
        assert sn.hop_tracker.events[-1].event == "track_drop"


class TestWidebandFollow:
    def test_connect_req_unlocks_data_channels(self, rng):
        """After a CONNECT_REQ on ch37, the wideband follower hears the
        connection on EVERY data channel simultaneously — no dwell
        timing needed (capability beyond the reference's single radio)."""
        d1 = data_pdu(rng, 12)
        d2 = data_pdu(rng, 20)

        cr_phy = G.assemble_phy_bits(connect_req_pdu(), 37)
        cr80 = G.gfsk_modulate_float(cr_phy, 80)

        def data80(pdu, ch):
            phy = G.assemble_phy_bits(pdu, ch, crc_init_hex=CRC_INIT_HEX,
                                      access_address_hex=CONN_AA_HEX)
            return G.gfsk_modulate_float(phy, 80)

        block_wb = (8192 + 1473) * 20  # one sniffer block
        n = 2 * 8192 * 20 + 40000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        s1i, s1q = synthesize_wideband({37: cr80}, n, {37: 50_000})
        wi += s1i
        wq += s1q
        # data packets in the SECOND block (device arrays update between blocks)
        pos2 = 8192 * 20 + 60_000
        s2i, s2q = synthesize_wideband({9: data80(d1, 9), 18: data80(d2, 18)},
                                       n, {9: pos2, 18: pos2 + 30_000})
        wi += s2i
        wq += s2q

        sn = WidebandSniffer(WidebandConfig(follow_connections=True))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        by_ch = {p.channel: p for p in pkts}
        assert 37 in by_ch and int(by_ch[37].header.pdu_type) == 5
        assert 9 in by_ch
        np.testing.assert_array_equal(by_ch[9].pdu_bytes, B.bits_to_bytes(d1))
        assert 18 in by_ch
        np.testing.assert_array_equal(by_ch[18].pdu_bytes, B.bits_to_bytes(d2))
        assert sn.connection is not None and sn.connection.access_addr == CONN_AA


class TestFollowRobustness:
    def test_second_connect_req_does_not_rekey(self, rng):
        """While a connection is tracked, a different CONNECT_REQ must NOT
        steal the data-channel keys (the reference controller only
        consumes receiver_status in state 0; review regression)."""
        cr1 = connect_req_pdu()
        # a different connection: other AA + other CRC init
        pdu2 = B.bits_to_bytes(connect_req_pdu())
        pdu2[2 + 12 : 2 + 16] = list((0x12345678).to_bytes(4, "little"))
        cr2 = B.bytes_to_bits(pdu2)

        block = 8192 * 20
        n = 3 * block
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        a = G.gfsk_modulate_float(G.assemble_phy_bits(cr1, 37), 80)
        b = G.gfsk_modulate_float(G.assemble_phy_bits(cr2, 37), 80)
        s1i, s1q = synthesize_wideband({37: a}, n, {37: 30000})
        s2i, s2q = synthesize_wideband({37: b}, n, {37: block + 30000})
        wi += s1i + s2i
        wq += s1q + s2q
        sn = WidebandSniffer(WidebandConfig(follow_connections=True))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        assert len(pkts) == 2
        # still keyed to the FIRST connection
        assert sn.connection.access_addr == CONN_AA
        from btle_tpu.wideband import channel_to_bin
        from btle_tpu.spec import bits as B2

        aa_rows = np.asarray(sn.aa_rows)
        expected = B2.hex_to_bits(CONN_AA.to_bytes(4, "little").hex())
        np.testing.assert_array_equal(aa_rows[channel_to_bin(9)], expected)

    def test_tiny_scan_len_context(self, rng):
        """scan_len_ch*D smaller than the filter length must still carry
        correct history (review regression for the zero-filled tail)."""
        scan_len = 32  # step=640 < num_taps-1=1279
        sig, exp = make_channel_burst_local(rng)
        aa_ch_pos = 8 * scan_len + 5
        start_wb = (aa_ch_pos - 32) * 20
        n = start_wb + len(sig[0]) + 40 * scan_len * 20
        wi, wq = synthesize_wideband({17: sig}, n, {17: start_wb})
        sn = WidebandSniffer(WidebandConfig(scan_len_ch=scan_len))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok and p.channel == 17]
        assert len(pkts) == 1
        np.testing.assert_array_equal(pkts[0].pdu_bytes, exp)


def make_channel_burst_local(rng):
    payload = rng.integers(0, 256, 8, dtype=np.uint8)
    pdu = B.bytes_to_bits(np.concatenate([[0x01, 8], payload]).astype(np.uint8))
    phy = G.assemble_phy_bits(pdu, 17)
    return G.gfsk_modulate_float(phy, 80), B.bits_to_bytes(pdu)
