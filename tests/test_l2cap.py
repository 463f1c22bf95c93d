"""L2CAP reassembly + ATT parsing (ll/l2cap.py) — the layers above the
LL octets the reference stops at.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.ll.l2cap import (ATT_OPCODES, CID_ATT, L2capReassembler,
                               att_stream, parse_att)


def l2cap(cid: int, payload: bytes) -> bytes:
    return len(payload).to_bytes(2, "little") + cid.to_bytes(2, "little") \
        + payload


class TestReassembly:
    def test_single_fragment(self):
        rs = L2capReassembler()
        frames = rs.feed(2, l2cap(CID_ATT, b"\x0a\x03\x00"))
        assert len(frames) == 1
        assert frames[0].cid == CID_ATT and frames[0].cid_name == "ATT"
        assert frames[0].payload == b"\x0a\x03\x00"

    def test_three_fragment_sdu(self):
        whole = l2cap(CID_ATT, bytes([0x1B, 0x10, 0x00]) + bytes(range(40)))
        rs = L2capReassembler()
        assert rs.feed(2, whole[:10]) == []
        assert rs.feed(1, whole[10:20]) == []
        frames = rs.feed(1, whole[20:])
        assert len(frames) == 1
        assert frames[0].payload == whole[4:]

    def test_two_sdus_in_one_pdu(self):
        a = l2cap(CID_ATT, b"\x0b\x42")
        b = l2cap(CID_ATT, b"\x13")
        frames = L2capReassembler().feed(2, a + b)
        assert [f.payload for f in frames] == [b"\x0b\x42", b"\x13"]

    def test_missed_start_discards(self):
        rs = L2capReassembler()
        assert rs.feed(1, b"\x99\x99") == []     # continuation, no start
        assert rs.discarded == 1
        # a fresh start mid-partial discards the stale partial
        whole = l2cap(CID_ATT, bytes(30))
        rs.feed(2, whole[:8])
        frames = rs.feed(2, l2cap(CID_ATT, b"\x0b"))
        assert rs.discarded == 2 and len(frames) == 1

    def test_empty_pdu_ignored(self):
        rs = L2capReassembler()
        whole = l2cap(CID_ATT, bytes([0x0B]) + bytes(10))
        rs.feed(2, whole[:6])
        assert rs.feed(1, b"") == []             # LL keep-alive
        assert rs.feed(1, whole[6:])[0].payload == whole[4:]


class TestAtt:
    def test_common_ops(self):
        ntf = parse_att(bytes([0x1B, 0x2A, 0x00]) + b"\x64")
        assert ntf.name == "ATT_HANDLE_VALUE_NTF"
        assert ntf.handle == 0x2A and ntf.value == b"\x64"
        w = parse_att(bytes([0x52, 0x10, 0x00]) + b"\x01")
        assert w.name == "ATT_WRITE_CMD" and w.handle == 0x10
        mtu = parse_att(bytes([0x02, 0xF7, 0x00]))
        assert mtu.mtu == 247
        err = parse_att(bytes([0x01, 0x0A, 0x05, 0x00, 0x0A]))
        assert err.error == (0x0A, 5, 0x0A)
        rd = parse_att(bytes([0x0B]) + b"value!")
        assert rd.value == b"value!"
        assert parse_att(b"") is None

    def test_att_stream_over_fragments(self):
        ops_in = [bytes([0x0A, 0x03, 0x00]),
                  bytes([0x0B]) + b"hello",
                  bytes([0x1B, 0x2A, 0x00]) + b"\x42\x43"]
        pdus = []
        for k, op in enumerate(ops_in):
            whole = l2cap(CID_ATT, op)
            if k == 1:                       # fragment the middle one
                pdus += [(2, whole[:5]), (1, whole[5:])]
            else:
                pdus.append((2, whole))
        ops = att_stream(pdus)
        assert [o.name for o in ops] == [
            "ATT_READ_REQ", "ATT_READ_RSP", "ATT_HANDLE_VALUE_NTF"]
        assert ops[1].value == b"hello"
        assert ops[2].handle == 0x2A and ops[2].value == b"\x42\x43"


class TestSniffedGatt:
    def test_gatt_over_decrypted_connection(self, rng):
        """Full stack: encrypted LL PDUs carrying a fragmented ATT
        notification -> wideband sniff -> decrypt -> L2CAP reassembly ->
        parsed GATT operation."""
        from btle_tpu.golden import model as G
        from btle_tpu.ll.crypto import LlSession, session_key
        from btle_tpu.spec import bits as B
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)

        ltk = bytes(range(16))
        skd = bytes(range(16, 32))
        tx = LlSession(sk=session_key(ltk, skd), iv=bytes(8))
        rx = LlSession(sk=tx.sk, iv=tx.iv)

        att = bytes([0x1B, 0x2A, 0x00]) + b"heart-rate=72"
        whole = l2cap(CID_ATT, att)
        frags = [(2, whole[:9]), (1, whole[9:])]
        n = 400_000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        octets = []
        for llid, frag in frags:
            hdr = llid & 0x03
            enc = tx.encrypt(hdr, frag, 0)
            octets.append(bytes([hdr, len(enc)]) + enc)
        for k, o in enumerate(octets):
            pdu = B.bytes_to_bits(np.frombuffer(o, np.uint8))
            si, sq = synthesize_wideband(
                {21: G.gfsk_modulate_float(G.assemble_phy_bits(pdu, 21), 80)},
                n, {21: 20_000 + 120_000 * k})
            wi += si
            wq += sq
        pkts = sorted((p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
                       if p.crc_ok and p.channel == 21),
                      key=lambda p: p.sample_pos)
        assert len(pkts) == 2
        data_pdus = []
        for p in pkts:
            raw = bytes(p.pdu_bytes)
            plain = rx.decrypt(raw[0], raw[2:], 0)
            assert plain is not None
            data_pdus.append((raw[0] & 0x03, plain))
        ops = att_stream(data_pdus)
        assert len(ops) == 1
        assert ops[0].name == "ATT_HANDLE_VALUE_NTF"
        assert ops[0].handle == 0x2A
        assert ops[0].value == b"heart-rate=72"


class TestReconGatt:
    def test_pcap_gatt_report_with_ltk(self, tmp_path, rng):
        """recon gatt: pcap in, decrypted GATT operations out — the
        capture itself carries the LL_ENC_REQ/RSP that key the session."""
        from test_hop import CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu

        from btle_tpu.cli.recon import gatt
        from btle_tpu.golden import model as G
        from btle_tpu.ll.crypto import LlSession
        from btle_tpu.spec import bits as B
        from btle_tpu.stream.pcap import PcapWriter
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)
        from btle_tpu.wideband.stream import WidebandStreamRunner

        LTK = bytes.fromhex("4C68384139F574D836BCF34E9DFB01BF")
        SKD_M = bytes.fromhex("13024212ACDEAF99")
        SKD_S = bytes.fromhex("7907E2021B24D379")
        IV_M = bytes.fromhex("BADCAB24")
        IV_S = bytes.fromhex("DEAFBABE")
        tx = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
        att = bytes([0x12, 0x33, 0x00]) + b"\x07\x08"   # WRITE_REQ
        frame = l2cap(CID_ATT, att)
        enc = tx.encrypt(0x02, frame, 0)

        enc_req = bytes([0x03, 23, 0x03]) + bytes(range(8)) + b"\x11\x22" \
            + SKD_M + IV_M
        enc_rsp = bytes([0x03, 13, 0x04]) + SKD_S + IV_S
        enc_data = bytes([0x02, len(enc)]) + enc

        block = 8192 * 20
        n = 2 * block
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        si, sq = synthesize_wideband(
            {37: G.gfsk_modulate_float(
                G.assemble_phy_bits(connect_req_pdu(), 37), 80)},
            n, {37: 20_000})
        wi += si
        wq += sq
        kw = dict(crc_init_hex=CRC_INIT_HEX, access_address_hex=CONN_AA_HEX)
        for ch, octets, off in ((9, enc_req, block + 20_000),
                                (9, enc_rsp, block + 60_000),
                                (9, enc_data, block + 100_000)):
            pdu = B.bytes_to_bits(np.frombuffer(octets, np.uint8))
            si, sq = synthesize_wideband(
                {ch: G.gfsk_modulate_float(
                    G.assemble_phy_bits(pdu, ch, **kw), 80)},
                n, {ch: off})
            wi += si
            wq += sq

        pcap_path = tmp_path / "conn.pcap"
        sn = WidebandSniffer(WidebandConfig(follow_connections=True))
        runner = WidebandStreamRunner(sn, pcap=PcapWriter(str(pcap_path)))
        runner.run_capture(wi, wq)
        runner.pcap.close()

        rep = gatt(str(pcap_path), ltk_hex=LTK.hex())
        assert rep.n_ctrl_pdus >= 2 and rep.n_data_pdus >= 1
        assert rep.n_decrypted == 1
        assert len(rep.ops) == 1
        op = rep.ops[0]
        assert op.name == "ATT_WRITE_REQ" and op.handle == 0x33
        assert op.value_hex == "0708" and op.decrypted

        # without the key: traffic counted, nothing decrypts
        rep2 = gatt(str(pcap_path))
        assert rep2.n_decrypted == 0 and not any(
            o.decrypted for o in rep2.ops)
