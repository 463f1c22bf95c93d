"""LL encryption (ll/crypto.py): session-key derivation + AES-CCM data
PDU crypto for sniffed connections — beyond-reference (the C tool can
only watch encrypted connections go dark).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
pytest.importorskip("cryptography")

from btle_tpu.ll.crypto import LlSession, aes_e, session_key


LTK = bytes.fromhex("4C68384139F574D836BCF34E9DFB01BF")
SKD_M = bytes.fromhex("13024212ACDEAF99")     # on-air LE order, as parsed
SKD_S = bytes.fromhex("7907E2021B24D379")
IV_M = bytes.fromhex("BADCAB24")
IV_S = bytes.fromhex("DEAFBABE")


def make_pair():
    tx = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
    rx = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
    return tx, rx


class TestPrimitives:
    def test_aes_e_is_aes128(self):
        # FIPS-197 known-answer: AES-128 of the standard test vector
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        assert aes_e(key, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"

    def test_session_key_deterministic(self):
        skd = (SKD_M + SKD_S)[::-1]
        sk = session_key(LTK, skd)
        assert sk == session_key(LTK, skd) and len(sk) == 16
        assert sk != session_key(LTK, bytes(16))

    def test_bad_lengths(self):
        with pytest.raises(ValueError):
            session_key(LTK[:8], bytes(16))


class TestSession:
    def test_loopback_both_directions(self):
        tx, rx = make_pair()
        for direction in (0, 1):
            for k in range(5):
                payload = bytes([direction] * 4 + [k] * 6)
                hdr = 0x02 | (k % 2) << 3          # SN toggles
                ct = tx.encrypt(hdr, payload, direction)
                assert len(ct) == len(payload) + 4  # MIC appended
                assert ct[: len(payload)] != payload
                assert rx.decrypt(hdr, ct, direction) == payload

    def test_aad_masks_retransmission_bits(self):
        # NESN/SN/MD may differ on a retransmission; MIC must not care
        tx, rx = make_pair()
        ct = tx.encrypt(0x02, b"hello-enc", 0)
        assert rx.decrypt(0x02 | 0x04 | 0x08 | 0x10, ct, 0) == b"hello-enc"

    def test_llid_is_authenticated(self):
        tx, rx = make_pair()
        ct = tx.encrypt(0x02, b"payload!", 0)
        assert rx.decrypt(0x01, ct, 0) is None      # LLID flip -> MIC fail

    def test_mic_tamper_detected(self):
        tx, rx = make_pair()
        ct = bytearray(tx.encrypt(0x02, b"abcdef", 0))
        ct[-1] ^= 1
        assert rx.decrypt(0x02, bytes(ct), 0) is None

    def test_counter_resync_over_missed_pdus(self):
        tx, rx = make_pair()
        cts = [tx.encrypt(0x02, bytes([k] * 8), 0) for k in range(6)]
        # the sniffer missed packets 0-3; 4 must still decrypt
        assert rx.decrypt(0x02, cts[4], 0) == bytes([4] * 8)
        assert rx.counters[0] == 5
        assert rx.decrypt(0x02, cts[5], 0) == bytes([5] * 8)
        # beyond the resync window: refused
        tx2, rx2 = make_pair()
        cts2 = [tx2.encrypt(0x02, b"x" * 4, 0) for _ in range(12)]
        assert rx2.decrypt(0x02, cts2[11], 0) is None

    def test_directions_independent(self):
        tx, rx = make_pair()
        c0 = tx.encrypt(0x02, b"m2s", 0)
        c1 = tx.encrypt(0x02, b"s2m", 1)
        # wrong direction -> wrong nonce -> MIC failure
        assert rx.decrypt(0x02, c0, 1) is None
        assert rx.decrypt(0x02, c0, 0) == b"m2s"
        assert rx.decrypt(0x02, c1, 1) == b"s2m"


class TestSniffedEndToEnd:
    def test_encrypted_connection_through_wideband(self, rng):
        """Synthesize an encrypted LL_DATA on a data channel, sniff it
        on the wideband path, decrypt with the session keys."""
        from btle_tpu.golden import model as G
        from btle_tpu.spec import bits as B
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)

        tx, rx_sess = make_pair()
        secret = b"top-secret-data"
        hdr = 0x02                                   # LL_DATA2
        enc = tx.encrypt(hdr, secret, 0)
        pdu = B.bytes_to_bits(np.frombuffer(
            bytes([hdr, len(enc)]) + enc, np.uint8))
        n = 200_000
        wi, wq = synthesize_wideband(
            {9: G.gfsk_modulate_float(G.assemble_phy_bits(pdu, 9), 80)},
            n, {9: 8_000})
        wi += rng.normal(0, 0.02, n).astype(np.float32)
        wq += rng.normal(0, 0.02, n).astype(np.float32)
        pkts = [p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
                if p.crc_ok and p.channel == 9]
        assert pkts
        raw = bytes(pkts[0].pdu_bytes)
        assert raw[0] == hdr and raw[2:] == enc      # sniffed ciphertext
        assert rx_sess.decrypt(raw[0], raw[2:], 0) == secret


class TestParsedExchange:
    def test_constructors_agree(self):
        from btle_tpu.ll.pdu import LlPduType, parse_ll_payload

        # on-air LL_ENC_REQ/RSP bytes (fields little-endian)
        enc_req = bytes([0x03]) + bytes(range(8)) + b"\x11\x22" \
            + SKD_M + IV_M
        enc_rsp = bytes([0x04]) + SKD_S + IV_S
        req = parse_ll_payload(enc_req, LlPduType.LL_CTRL).ctrl.fields
        rsp = parse_ll_payload(enc_rsp, LlPduType.LL_CTRL).ctrl.fields
        a = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
        b = LlSession.from_parsed_exchange(LTK, req, rsp)
        assert a.sk == b.sk and a.iv == b.iv

    def test_full_sniffed_exchange_decrypts(self, rng):
        """The whole story on one wideband capture: LL_ENC_REQ +
        LL_ENC_RSP sniffed on a data channel, session built from the
        parsed fields, the following encrypted PDU decrypted."""
        from btle_tpu.golden import model as G
        from btle_tpu.ll.pdu import LlPduType, parse_ll_payload
        from btle_tpu.spec import bits as B
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)

        enc_req = bytes([0x03]) + bytes(range(8)) + b"\x11\x22" \
            + SKD_M + IV_M
        enc_rsp = bytes([0x04]) + SKD_S + IV_S
        tx = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
        secret = b"encrypted-link!"
        enc_payload = tx.encrypt(0x02, secret, 0)

        n = 400_000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        frames = [
            (17, bytes([0x03, len(enc_req)]) + enc_req, 8_000),
            (17, bytes([0x03, len(enc_rsp)]) + enc_rsp, 150_000),
            (17, bytes([0x02, len(enc_payload)]) + enc_payload, 290_000),
        ]
        for ch, octets, off in frames:
            pdu = B.bytes_to_bits(np.frombuffer(octets, np.uint8))
            si, sq = synthesize_wideband(
                {ch: G.gfsk_modulate_float(G.assemble_phy_bits(pdu, ch), 80)},
                n, {ch: off})
            wi += si
            wq += sq
        pkts = sorted((p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
                       if p.crc_ok and p.channel == 17),
                      key=lambda p: p.sample_pos)
        assert len(pkts) == 3
        req = parse_ll_payload(bytes(pkts[0].pdu_bytes[2:]),
                               LlPduType.LL_CTRL).ctrl.fields
        rsp = parse_ll_payload(bytes(pkts[1].pdu_bytes[2:]),
                               LlPduType.LL_CTRL).ctrl.fields
        sess = LlSession.from_parsed_exchange(LTK, req, rsp)
        raw = bytes(pkts[2].pdu_bytes)
        assert sess.decrypt(raw[0], raw[2:], 0) == secret


class TestRunnerIntegration:
    def test_wideband_ltk_decrypts_followed_connection(self, rng):
        """The whole deployed story: CONNECT_REQ followed -> data
        channels re-keyed -> LL_ENC_REQ/RSP sniffed on the connection's
        AA -> encrypted PDU decrypts in-stream and lands in NDJSON as
        plain_hex (wideband --ltk)."""
        import io
        import json

        from test_hop import CONN_AA, CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu

        from btle_tpu.golden import model as G
        from btle_tpu.spec import bits as B
        from btle_tpu.stream.ndjson import NdjsonEmitter
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)
        from btle_tpu.wideband.stream import WidebandStreamRunner

        tx = LlSession.from_enc_exchange(LTK, SKD_M, SKD_S, IV_M, IV_S)
        secret = b"wideband-secret"
        enc_payload = tx.encrypt(0x02, secret, 0)

        enc_req = bytes([0x03, 23, 0x03]) + bytes(range(8)) + b"\x11\x22" \
            + SKD_M + IV_M
        enc_rsp = bytes([0x03, 13, 0x04]) + SKD_S + IV_S
        enc_data = bytes([0x02, len(enc_payload)]) + enc_payload

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
        conn_kw = dict(crc_init_hex=CRC_INIT_HEX,
                       access_address_hex=CONN_AA_HEX)
        for ch, octets, off in ((9, enc_req, block + 20_000),
                                (9, enc_rsp, block + 60_000),
                                (9, enc_data, block + 100_000)):
            pdu = B.bytes_to_bits(np.frombuffer(octets, np.uint8))
            si, sq = synthesize_wideband(
                {ch: G.gfsk_modulate_float(
                    G.assemble_phy_bits(pdu, ch, **conn_kw), 80)},
                n, {ch: off})
            wi += si
            wq += sq

        out = io.StringIO()
        sn = WidebandSniffer(WidebandConfig(follow_connections=True))
        runner = WidebandStreamRunner(sn, ndjson=NdjsonEmitter(out), ltk=LTK)
        runner.run_capture(wi, wq)
        evs = [json.loads(ln) for ln in out.getvalue().splitlines()]
        data = [e for e in evs if e.get("kind") == "data" and e["crc_ok"]]
        assert any(e["aa"] == f"{CONN_AA:08x}" for e in data)
        plains = [e for e in data if "plain_hex" in e]
        assert plains and plains[0]["plain_hex"] == secret.hex()
        assert runner.decryptor.decrypted == 1
