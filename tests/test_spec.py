"""Spec-layer tests: bit order, CRC24 (three forms), whitening, channels.

Spot-check values are transcribed from the reference's published tables
(scramble_table.h, crc_table in btle_rx.c) — the implementations here are
generated from the LFSR/polynomial definitions, not from those tables.
"""

import numpy as np
import pytest

from btle_tpu.spec import bits as B
from btle_tpu.spec import channels as CH
from btle_tpu.spec import crc24 as C
from btle_tpu.spec import whitening as W


class TestBits:
    def test_hex_roundtrip(self):
        assert B.bits_to_hex(B.hex_to_bits("d6be898e")) == "d6be898e"

    def test_hex_to_bits_lsb_first(self):
        # 0xAA = 10101010 -> LSB-first 0,1,0,1,...
        np.testing.assert_array_equal(B.hex_to_bits("aa"), [0, 1, 0, 1, 0, 1, 0, 1])
        # btlelib nibble swap example: '42' -> bit pattern of byte 0x42 LSB-first
        np.testing.assert_array_equal(B.hex_to_bits("42"), [0, 1, 0, 0, 0, 0, 1, 0])

    def test_bits_bytes_roundtrip(self):
        b = np.array([0xD6, 0xBE, 0x89, 0x8E], dtype=np.uint8)
        np.testing.assert_array_equal(B.bits_to_bytes(B.bytes_to_bits(b)), b)

    def test_uint_bits(self):
        assert B.bits_to_uint(B.uint_to_bits(37, 6)) == 37

    def test_reverse24(self):
        assert B.reverse_bits24(0x555555) == 0xAAAAAA
        assert B.reverse_bits24(0x000001) == 0x800000

    def test_mac(self):
        m = B.mac_str_to_bytes("AA:BB:CC:DD:EE:FF")
        assert B.mac_bytes_to_str(m) == "aa:bb:cc:dd:ee:ff"


class TestCrc24:
    # First entries of the reference table (btle_rx.c:971-975) — transcribed
    # spot values only; our table is generated from the polynomial.
    REF_TABLE_SPOTS = {
        0: 0x000000,
        1: 0x01B4C0,
        2: 0x036980,
        8: 0x0DA600,
        16: 0x1B4C00,
        255: 0x932C40,
    }

    def test_table_spot_values(self):
        for idx, val in self.REF_TABLE_SPOTS.items():
            assert int(C.CRC24_TABLE[idx]) == val, idx

    def test_init_conversion(self):
        assert C.lfsr_init_to_table_init("555555") == 0xAAAAAA

    def test_crc_init_reorder(self):
        # identity-style case: 0x555555 swaps/reverses to 0xAAAAAA
        assert C.crc_init_reorder(0x555555) == 0xAAAAAA

    @pytest.mark.parametrize("nbytes", [1, 2, 7, 39])
    def test_lfsr_equals_table(self, nbytes, rng):
        data = rng.integers(0, 256, nbytes, dtype=np.uint8)
        bits = B.bytes_to_bits(data)
        crc_bits = C.crc24_bits(bits, B.hex_to_bits("555555"))
        crc_tab = C.crc24_bytes(data, 0xAAAAAA)
        # On-air bits packed LSB-first equal the table value's LE bytes
        assert B.bits_to_uint(crc_bits) == crc_tab

    def test_crc_roundtrip_check(self, rng):
        data = rng.integers(0, 256, 10, dtype=np.uint8)
        crc = C.crc24_bytes(data, 0xAAAAAA)
        rx = np.concatenate([data, C.crc_to_bytes(crc)])
        assert C.crc_received_from_bytes(rx[-3:]) == C.crc24_bytes(rx[:-3], 0xAAAAAA)

    def test_nonstandard_init_reorder_consistency(self, rng):
        """A CONNECT_REQ CRCInit must verify packets whitened with the
        LFSR-form init (btle_tx CRCInit field is given MSB-first on air)."""
        # TX uses crc24 LFSR with init bits = hex_to_bits(crc_init_hex);
        # RX sniffs CRCInit as an integer B.bits→ parse order and reorders.
        crc_hex = "a77b22"
        data = rng.integers(0, 256, 12, dtype=np.uint8)
        crc_bits = C.crc24_bits(B.bytes_to_bits(data), B.hex_to_bits(crc_hex))
        # RX side: CRCInit integer parsed from on-air bytes (btle_rx.c:1649)
        raw = bytes.fromhex(crc_hex)
        sniffed = (raw[0] << 16) | (raw[1] << 8) | raw[2]
        table_init = C.crc_init_reorder(sniffed)
        assert B.bits_to_uint(crc_bits) == C.crc24_bytes(data, table_init)


class TestWhitening:
    # Spot values from scramble_table.h rows (channel, first bytes)
    REF_SPOTS = {
        0: [64, 178, 188, 195, 31, 55],
        9: [193, 214, 197, 68, 32, 89],
        37: [141, 210, 87, 161, 61, 167],
        38: [214, 197, 68, 32, 89, 222],
        39: [31, 55, 74, 95, 133, 246],
    }

    def test_table_spot_values(self):
        tab = W.make_whitening_table()
        assert tab.shape == (40, 42)
        for ch, head in self.REF_SPOTS.items():
            np.testing.assert_array_equal(tab[ch, : len(head)], head)

    def test_involution(self, rng):
        bits = rng.integers(0, 2, 100).astype(np.int8)
        assert np.array_equal(W.whiten_bits(W.whiten_bits(bits, 21), 21), bits)

    def test_bit_table_matches_byte_table(self):
        bt = W.make_whitening_bit_table(42 * 8)
        tab = W.make_whitening_table()
        for ch in (0, 17, 37):
            np.testing.assert_array_equal(
                np.packbits(bt[ch].astype(np.uint8), bitorder="little"), tab[ch]
            )


class TestChannels:
    def test_known_frequencies(self):
        assert CH.channel_to_freq_hz(37) == 2_402_000_000
        assert CH.channel_to_freq_hz(38) == 2_426_000_000
        assert CH.channel_to_freq_hz(39) == 2_480_000_000
        assert CH.channel_to_freq_hz(0) == 2_404_000_000
        assert CH.channel_to_freq_hz(10) == 2_424_000_000
        assert CH.channel_to_freq_hz(11) == 2_428_000_000
        assert CH.channel_to_freq_hz(36) == 2_478_000_000

    def test_uniform_grid_bijection(self):
        grid = sorted(CH.grid_index(c) for c in range(40))
        assert grid == list(range(40))
        for ch in range(40):
            assert CH.GRID_TO_CHANNEL[CH.CHANNEL_TO_GRID[ch]] == ch

    def test_full_map(self):
        assert CH.chm_is_full_map([0x1F, 0xFF, 0xFF, 0xFF, 0xFF])
        assert not CH.chm_is_full_map([0x1F, 0xFF, 0xFF, 0xFF, 0xFE])

    def test_hop(self):
        assert CH.data_channel_hop(0, 9) == 9
        assert CH.data_channel_hop(30, 9) == 2
