"""TX descriptor DSL + synthesis tests, including end-to-end parity:
the usrp_replay descriptor file must synthesize the exact capture IQ, and
every packet type must loop back through the receiver."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.ll import AdvPduType, LlCtrlOpcode, LlPduType, parse_adv_payload, parse_ll_payload
from btle_tpu.rx import stream_decode
from btle_tpu.spec import bits as B
from btle_tpu.tx import (
    DescriptorError,
    parse_descriptor,
    parse_descriptor_sequence,
    read_packet_file,
    synthesize,
)

from test_golden import load_usrp_capture

WELCOME_FILE = "/root/reference/usrp_replay_example/welcom_packets_discovery.txt"

# Canonical examples from the reference usage comments (btle_tx.c)
EXAMPLES = {
    "DISCOVERY": "37-DISCOVERY-TxAdd-1-RxAdd-0-AdvA-010203040506-FLAGS-02-LOCAL_NAME09-CA-TXPOWER-03-SERVICE03-180D1810-SERVICE_DATA-180D40-MANUF_DATA-0001FF-CONN_INTERVAL-0006",
    "ADV_IND": "37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-00112233445566778899AABBCCDDEEFF",
    "ADV_DIRECT_IND": "37-ADV_DIRECT_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-InitA-0708090A0B0C",
    "ADV_NONCONN_IND": "37-ADV_NONCONN_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-001122",
    "ADV_SCAN_IND": "37-ADV_SCAN_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-001122",
    "SCAN_REQ": "37-SCAN_REQ-TxAdd-1-RxAdd-0-ScanA-010203040506-AdvA-0708090A0B0C",
    "SCAN_RSP": "37-SCAN_RSP-TxAdd-1-RxAdd-0-AdvA-010203040506-ScanRspData-00112233",
    "CONNECT_REQ": "37-CONNECT_REQ-TxAdd-0-RxAdd-0-InitA-001830EA965F-AdvA-90D7EBB19299-AA-60850A1B-CRCInit-A77B22-WinSize-02-WinOffset-000F-Interval-0050-Latency-0000-Timeout-07D0-ChM-1FFFFFFFFF-Hop-9-SCA-5",
    "IBEACON": "37-IBEACON-AdvA-010203040506-UUID-B9407F30F5F8466EAFF925556B57FE6D-Major-0008-Minor-0009-TxPower-C5-Space-100",
    "LL_DATA": "9-LL_DATA-AA-60850A1B-LLID-1-NESN-0-SN-0-MD-0-DATA-AABBCC-CRCInit-A77B22",
    "LL_CONNECTION_UPDATE_REQ": "9-LL_CONNECTION_UPDATE_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-WinSize-02-WinOffset-000F-Interval-0050-Latency-0000-Timeout-07D0-Instant-0000-CRCInit-A77B22",
    "LL_CHANNEL_MAP_REQ": "9-LL_CHANNEL_MAP_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-ChM-1FFFFFFFFF-Instant-0001-CRCInit-A77B22",
    "LL_TERMINATE_IND": "9-LL_TERMINATE_IND-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-ErrorCode-13-CRCInit-A77B22",
    "LL_ENC_REQ": "9-LL_ENC_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-Rand-0102030405060708-EDiv-090A-SKDm-0102030405060708-IVm-01020304-CRCInit-A77B22",
    "LL_ENC_RSP": "9-LL_ENC_RSP-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-SKDs-0102030405060708-IVs-01020304-CRCInit-A77B22",
    "LL_START_ENC_REQ": "9-LL_START_ENC_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-CRCInit-A77B22",
    "LL_START_ENC_RSP": "9-LL_START_ENC_RSP-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-CRCInit-A77B22",
    "LL_UNKNOWN_RSP": "9-LL_UNKNOWN_RSP-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-UnknownType-01-CRCInit-A77B22",
    "LL_FEATURE_REQ": "9-LL_FEATURE_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-FeatureSet-0000000000000001-CRCInit-A77B22",
    "LL_FEATURE_RSP": "9-LL_FEATURE_RSP-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-FeatureSet-0000000000000001-CRCInit-A77B22",
    "LL_PAUSE_ENC_REQ": "9-LL_PAUSE_ENC_REQ-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-CRCInit-A77B22",
    "LL_PAUSE_ENC_RSP": "9-LL_PAUSE_ENC_RSP-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-CRCInit-A77B22",
    "LL_VERSION_IND": "9-LL_VERSION_IND-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-VersNr-07-CompId-0059-SubVersNr-1234-CRCInit-A77B22",
    "LL_REJECT_IND": "9-LL_REJECT_IND-AA-60850A1B-LLID-3-NESN-0-SN-0-MD-0-ErrorCode-06-CRCInit-A77B22",
    "RAW": "39-RAW-AAD6BE898E5F134B5D86F2999CC3D7DF5EDF15DEE39AA2E5D0728EB68B0E449B07C547B80EAA8DD257A0E5EACB0B-SPACE-1000",
}


class TestParse:
    def test_all_25_types_parse(self):
        for t, d in EXAMPLES.items():
            spec = parse_descriptor(d)
            assert spec.pkt_type == t

    def test_discovery_payload_layout(self):
        spec = parse_descriptor(EXAMPLES["DISCOVERY"])
        pdu = B.bits_to_bytes(spec.info_bits)[5:]
        assert pdu[0] == 0x42          # ADV_NONCONN_IND | TxAdd
        payload = pdu[2 : 2 + pdu[1]]
        assert payload[:6].tolist() == [0x06, 0x05, 0x04, 0x03, 0x02, 0x01]
        ads = payload[6:]
        # FLAGS
        assert ads[0] == 2 and ads[1] == 0x01 and ads[2] == 0x02
        # LOCAL_NAME09 'CA'
        assert ads[3] == 3 and ads[4] == 0x09 and bytes(ads[5:7]) == b"CA"
        # TXPOWER
        assert ads[7] == 2 and ads[8] == 0x0A and ads[9] == 0x03
        # SERVICE03 flipped: 180D1810 -> 10 18 0D 18
        assert ads[10] == 5 and ads[11] == 0x03
        assert bytes(ads[12:16]) == bytes.fromhex("10180D18")
        # SERVICE_DATA part-flip: 180D40 -> 0D 18 40
        assert ads[16] == 4 and ads[17] == 0x16
        assert bytes(ads[18:21]) == bytes.fromhex("0D1840")

    def test_connect_req_round_trip_through_parser(self):
        spec = parse_descriptor(EXAMPLES["CONNECT_REQ"])
        pdu = B.bits_to_bytes(spec.info_bits)[5:]
        payload = parse_adv_payload(pdu[2:], AdvPduType.CONNECT_REQ)
        assert payload.adv_a == bytes.fromhex("90D7EBB19299")
        assert payload.aa == 0x60850A1B
        assert payload.crc_init == 0xA77B22
        assert payload.hop == 9 and payload.sca == 5
        assert payload.chm == bytes.fromhex("1FFFFFFFFF")

    def test_data_preamble_from_aa_lsb(self):
        spec = parse_descriptor(EXAMPLES["LL_DATA"])
        frame = B.bits_to_bytes(spec.info_bits)
        assert frame[0] == 0x55        # AA 0x60850A1B on-air first byte 0x1B (odd)
        assert bytes(frame[1:5]) == bytes.fromhex("1B0A8560")

    def test_repeat_spec(self):
        specs, rep = parse_descriptor_sequence([EXAMPLES["ADV_IND"], "r30"])
        assert len(specs) == 1 and rep == 30
        _, rep = parse_descriptor_sequence([EXAMPLES["ADV_IND"], "r-1"])
        assert rep == -1

    def test_errors(self):
        with pytest.raises(DescriptorError):
            parse_descriptor("37-NOSUCHTYPE-a-b")
        with pytest.raises(DescriptorError):
            parse_descriptor("37-ADV_IND-TxAdd-1")  # truncated
        with pytest.raises(DescriptorError):
            parse_descriptor("37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203")  # half MAC ok but wrong len? 3 octets allowed
        with pytest.raises(DescriptorError):
            parse_descriptor("37-RAW-ABC")  # half octet


class TestLoopback:
    @pytest.mark.parametrize("pkt_type", sorted(set(EXAMPLES) - {"RAW"}))
    def test_synthesize_and_decode(self, pkt_type):
        spec = parse_descriptor(EXAMPLES[pkt_type])
        [syn] = synthesize([spec], flavor="c", sps=4)
        pad = np.zeros(200, np.int16)
        i = np.concatenate([pad, syn.i.astype(np.int16), pad])
        q = np.concatenate([pad, syn.q.astype(np.int16), pad])
        adv = spec.channel in (37, 38, 39)
        from btle_tpu.spec import crc24 as C

        if adv:
            res = stream_decode(i, q, spec.channel, sps=4)
        else:
            aa = int.from_bytes(B.bits_to_bytes(spec.info_bits)[1:5].tobytes(), "little")
            crc_init = int(spec.crc_init_hex, 16)
            res = stream_decode(
                i, q, spec.channel, access_address=aa,
                crc_init_table=C.crc_init_reorder(
                    int.from_bytes(bytes.fromhex(spec.crc_init_hex), "big")
                ),
                sps=4,
            )
        ok = [p for p in res.packets if p.crc_ok]
        assert len(ok) == 1, pkt_type
        exp_pdu = B.bits_to_bytes(spec.info_bits)[5:]
        np.testing.assert_array_equal(ok[0].pdu_bytes, exp_pdu)
        # parse back the payload to close the loop
        if not adv and pkt_type != "LL_DATA":
            pl = parse_ll_payload(ok[0].pdu_bytes[2:], LlPduType.LL_CTRL)
            assert pl.ctrl.opcode == LlCtrlOpcode[pkt_type]


class TestUsrpReplayFile:
    def test_welcome_file_parses(self):
        """The shipped descriptor file (spaces inside LOCAL_NAME) parses:
        one DISCOVERY packet, repeat 40."""
        specs, rep = read_packet_file(WELCOME_FILE)
        assert rep == 40
        assert len(specs) == 1
        spec = specs[0]
        assert spec.pkt_type == "DISCOVERY"
        pdu = B.bits_to_bytes(spec.info_bits)[5:]
        name_len = pdu[8]
        assert bytes(pdu[10 : 10 + name_len - 1]) == b"SDR Bluetooth LE welcome u!"

    def test_descriptor_synthesis_reproduces_capture(self):
        """Synthesizing the descriptor the capture was actually made from
        must reproduce the capture IQ sample-exactly (the .bin is raw
        C-btle_tx output)."""
        desc = ("37-DISCOVERY-TxAdd-1-RxAdd-0-AdvA-010203040506-"
                "LOCAL_NAME09-imecUGent SDRgroup welcome u!")
        [syn] = synthesize([parse_descriptor(desc)], flavor="c", sps=4)
        ci, cq = load_usrp_capture()
        target = np.asarray(ci, dtype=np.int16)
        ours = syn.i.astype(np.int16)
        found = -1
        for off in range(len(target) - len(ours) + 1):
            if np.array_equal(target[off : off + len(ours)], ours):
                found = off
                break
        assert found >= 0, "descriptor synthesis must match the capture"
        np.testing.assert_array_equal(cq[found : found + len(ours)], syn.q)


class TestDescriptorFuzz:
    def test_random_strings_raise_descriptor_errors_only(self, rng):
        """Malformed descriptors must fail with DescriptorError, never
        with an unrelated exception (parser robustness)."""
        import string

        alphabet = string.ascii_letters + string.digits + "--..  !"
        for _ in range(300):
            n = int(rng.integers(1, 60))
            s = "".join(rng.choice(list(alphabet)) for _ in range(n))
            try:
                parse_descriptor(s)
            except DescriptorError:
                pass

    def test_truncations_of_valid_descriptors(self):
        for t, d in EXAMPLES.items():
            for cut in range(1, len(d), 7):
                try:
                    parse_descriptor(d[:cut])
                except DescriptorError:
                    pass


class TestShippedExampleFiles:
    """The repo ships example descriptor files (examples/packets/) in the
    reference's packets.txt tradition (connection establishment,
    discovery, iBeacon — btle-tools/src/packets*.txt). Each must parse,
    synthesize, and decode back CRC-OK."""

    FILES = {
        "connection_establishment": (3, 1),
        "discovery": (1, 3),
        "ibeacon": (1, 10),
    }

    @pytest.mark.parametrize("name", sorted(FILES))
    def test_parses_synthesizes_decodes(self, name):
        import os

        path = os.path.join(os.path.dirname(__file__), "..",
                            "examples", "packets", f"{name}.txt")
        n_items, rep = self.FILES[name]
        specs, got_rep = read_packet_file(path)
        assert (len(specs), got_rep) == (n_items, rep)
        for spec in specs:
            [syn] = synthesize([spec], flavor="c", sps=4)
            pad = np.zeros(200, np.int16)
            i = np.concatenate([pad, syn.i.astype(np.int16), pad])
            q = np.concatenate([pad, syn.q.astype(np.int16), pad])
            if spec.channel in (37, 38, 39):
                res = stream_decode(i, q, spec.channel, sps=4)
            else:
                from btle_tpu.spec import crc24 as C

                aa = int.from_bytes(
                    B.bits_to_bytes(spec.info_bits)[1:5].tobytes(), "little")
                res = stream_decode(
                    i, q, spec.channel, access_address=aa,
                    crc_init_table=C.crc_init_reorder(
                        int.from_bytes(bytes.fromhex(spec.crc_init_hex),
                                       "big")), sps=4)
            ok = [p for p in res.packets if p.crc_ok]
            assert len(ok) == 1, (name, spec.pkt_type)
