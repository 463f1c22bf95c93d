"""Golden-model tests: TX/RX loopback and bit-exact decode of the
reference's captured-IQ parity artifact (usrp_replay ch37 DISCOVERY packet,
C btle_tx output at 4 Msps)."""

import numpy as np
import pytest

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B

USRP_BIN = "/root/reference/usrp_replay_example/btle_ch37_iq_float32_welcom_msg.bin"

# The ADV payload used by the reference BER harness (test_btle_ber.py:27)
BER_PDU_HEX = "422506050403020119095344522f426c7565746f6f74682f4c6f772f456e657267791234567890"


def load_usrp_capture():
    d = np.fromfile(USRP_BIN, dtype=np.float32)
    iq = np.round(d * 256).astype(np.int16)  # int8 samples scaled by 1/256
    return iq[0::2], iq[1::2]


class TestTables:
    def test_gauss_fir_peak(self):
        h = G.gauss_fir(8)
        assert len(h) == 17
        # normalized so NRZ convolution peaks at ~1
        assert abs(np.sum(h) - 1.0) < 1e-3  # truncated to a 2-symbol span
        assert abs(np.max(h) - 0.18817296) < 1e-6

    def test_c_flavor_taps_match_reference_table(self):
        # gauss_coef_int8 from gauss_cos_sin_table.h
        np.testing.assert_array_equal(
            G.c_flavor_taps(4),
            [0, 0, 0, 0, 2, 11, 32, 53, 60, 53, 32, 11, 2, 0, 0, 0],
        )

    def test_table_sizes(self):
        cos_t, _ = G.sin_cos_tables(64, 8)
        assert len(cos_t) == 2048
        cos_t, _ = G.sin_cos_tables(64, 4)
        assert len(cos_t) == 1024


class TestLoopback:
    @pytest.mark.parametrize("channel", [37, 9])
    def test_python_flavor_loopback(self, channel, rng):
        kwargs = {}
        if channel not in (37, 38, 39):
            # data channel: LL DATA PDU (5-bit length field), sniffed AA/CRCInit
            payload = rng.integers(0, 256, 10, dtype=np.uint8)
            pdu_bytes = np.concatenate([[0x01, len(payload)], payload]).astype(np.uint8)
            pdu_bits = B.bytes_to_bits(pdu_bytes)
            kwargs = dict(crc_init_hex="a77b22", access_address_hex="1b0a8560")
        else:
            pdu_bits = B.hex_to_bits(BER_PDU_HEX)
        i, q, phy = G.btle_tx(pdu_bits, channel, **kwargs)
        res = G.btle_rx(i, q, channel, **kwargs)
        assert res.crc_ok
        np.testing.assert_array_equal(res.pdu_bits, pdu_bits)

    def test_loopback_with_noise_and_ppm(self, rng):
        pdu_bits = B.hex_to_bits(BER_PDU_HEX)
        i, q, _ = G.btle_tx(pdu_bits, 37)
        i2, q2, fo = G.add_freq_sampling_error(i, q, 20.0)
        assert abs(fo - 20e-6 * 2450e6) < 1
        i3, q3 = G.add_noise(i2, q2, 20.0, rng)
        res = G.btle_rx(i3, q3, 37)
        assert res.crc_ok
        np.testing.assert_array_equal(res.pdu_bits, pdu_bits)


class TestUsrpReplayParity:
    """Config-1 parity: decode the 4 Msps ch37 capture bit-exact."""

    def test_decode_capture_sps4(self):
        i, q = load_usrp_capture()
        res = G.btle_rx(i, q, 37, sps=4)
        assert res.crc_ok
        pdu = B.bits_to_bytes(res.pdu_bits)
        # header: ADV_NONCONN_IND(=DISCOVERY pdu type 2), TxAdd=1
        assert pdu[0] & 0x0F == 2
        assert (pdu[0] >> 6) & 1 == 1
        payload_len = pdu[1] & 0x3F
        assert payload_len == len(pdu) - 2
        # AdvA transmitted LSByte-first: descriptor AdvA-010203040506
        np.testing.assert_array_equal(pdu[2:8], [0x06, 0x05, 0x04, 0x03, 0x02, 0x01])
        # AD structure: local name
        name_len = pdu[8]
        assert pdu[9] == 0x09
        name = bytes(bytearray(pdu[10 : 10 + name_len - 1]))
        assert name == b"imecUGent SDRgroup welcome u!"

    def test_tx_reproduces_capture(self):
        """Synthesize the same DISCOVERY packet with the C-flavor modulator
        and compare int8 IQ against the capture."""
        i, q = load_usrp_capture()
        name = b"imecUGent SDRgroup welcome u!"
        adv_a = [0x06, 0x05, 0x04, 0x03, 0x02, 0x01]
        payload = adv_a + [len(name) + 1, 0x09] + list(name)
        header = [0x42, len(payload)]  # type 2 | TxAdd<<6, length
        pdu_bytes = np.array(header + payload, dtype=np.uint8)
        pdu_bits = B.bytes_to_bits(pdu_bytes)
        ci, cq, _ = G.btle_tx(pdu_bits, 37, sps=4, flavor="c")
        # capture has leading padding; locate our waveform inside it
        ci = np.asarray(ci, dtype=np.int16)
        target = np.asarray(i, dtype=np.int16)
        matched = False
        for off in range(0, len(target) - len(ci) + 1):
            if np.array_equal(target[off : off + len(ci)], ci):
                matched = True
                break
        assert matched, "synthesized I stream not found in capture"
        np.testing.assert_array_equal(q[off : off + len(ci)], cq)
