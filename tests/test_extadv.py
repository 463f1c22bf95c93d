"""BLE 5 extended advertising (ADV_EXT_IND, Common Extended Advertising
Payload — Core Vol 6 Part B 2.3.4). Beyond-reference: the C tool parses
only legacy ADV types 0-6, so every extended/coded advertiser is
invisible to it. Coded-PHY advertising uses this format natively, so
the E2E test rides the coded PHY end to end.
"""

import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.ll.pdu import (AdvPduType, build_ext_adv_payload,
                             extract_adv_a, parse_adv_header,
                             parse_adv_payload, parse_ext_adv_payload)
from btle_tpu.spec import bits as B
from btle_tpu.tx import parse_descriptor


class TestCodec:
    def test_full_field_roundtrip(self):
        p = build_ext_adv_payload(
            adv_mode=2,
            adv_a=bytes.fromhex("0a0b0c0d0e0f"),
            target_a=bytes.fromhex("102030405060"),
            adi=(0x123, 0xA),
            aux_ptr=(12, 1, 2400, 2),
            tx_power=-8,
            adv_data=b"\x02\x01\x06")
        ext = parse_ext_adv_payload(p)
        assert ext.adv_mode == 2
        assert ext.adv_a == bytes.fromhex("0a0b0c0d0e0f")
        assert ext.target_a == bytes.fromhex("102030405060")
        assert (ext.adi_did, ext.adi_sid) == (0x123, 0xA)
        assert (ext.aux_chan, ext.aux_ca, ext.aux_phy) == (12, 1, 2)
        assert ext.aux_offset_us == 2400
        assert ext.tx_power == -8
        # AdvData follows the extended header
        assert p[1 + (p[0] & 0x3F):] == b"\x02\x01\x06"

    def test_minimal_and_empty_header(self):
        p = build_ext_adv_payload(adv_mode=0, adv_data=b"\x11")
        ext = parse_ext_adv_payload(p)
        assert ext.adv_mode == 0 and ext.adv_a is None
        assert p[1:] == b"\x11"

    def test_aux_offset_units_300us(self):
        # offsets past the 13-bit 30us range switch to 300us units
        p = build_ext_adv_payload(adv_mode=0, aux_ptr=(5, 0, 600_000, 1))
        ext = parse_ext_adv_payload(p)
        assert ext.aux_offset_us == 600_000
        assert ext.aux_phy == 1

    def test_truncated_header_rejected(self):
        p = bytearray(build_ext_adv_payload(
            adv_mode=0, adv_a=bytes(6)))
        p[0] = (p[0] & 0xC0) | 0x3F          # claim 63-byte header
        with pytest.raises(ValueError):
            parse_ext_adv_payload(bytes(p))

    def test_parse_adv_payload_integration(self):
        p = build_ext_adv_payload(
            adv_mode=1, adv_a=bytes.fromhex("a1b2c3d4e5f6"),
            adv_data=b"\x99")
        pl = parse_adv_payload(p, AdvPduType.ADV_EXT_IND)
        assert pl.ext is not None and pl.ext.adv_mode == 1
        assert extract_adv_a(pl, AdvPduType.ADV_EXT_IND) \
            == bytes.fromhex("a1b2c3d4e5f6")
        assert bytes(pl.data) == b"\x99"


class TestEndToEnd:
    def test_ext_adv_over_coded_phy(self, tmp_path):
        """The realistic BLE 5 pairing: an ADV_EXT_IND framed for the
        Coded PHY, decoded back through the coded receiver and parsed
        down to the extended-header fields."""
        out = tmp_path / "ext.bin"
        desc = ("37-ADV_EXT_IND-TxAdd-0-RxAdd-0-AdvMode-0"
                "-AdvA-0A0B0C0D0E0F-AdvData-02010604097465" "-Space-1")
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "tx", desc,
             "--phy", "coded8", "--out", str(out)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        r2 = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "decode", "--bin", str(out),
             "--format", "f32", "--phy", "coded8", "--channel", "37"],
            capture_output=True, text=True)
        assert r2.returncode == 0, r2.stderr
        line = [ln for ln in r2.stdout.splitlines() if " crc0 " in ln][0]
        pdu = bytes.fromhex(line.split()[-1])
        hdr = parse_adv_header(pdu[:2])
        assert hdr.pdu_type == AdvPduType.ADV_EXT_IND
        pl = parse_adv_payload(pdu[2:], hdr.pdu_type)
        assert pl.adv_a == bytes.fromhex("0a0b0c0d0e0f")
        assert bytes(pl.data) == bytes.fromhex("02010604097465")

    def test_ext_adv_1m_wideband_scan(self, rng):
        """ADV_EXT_IND on the uncoded 1M wideband path decodes and
        parses too (extended advertising is PHY-independent)."""
        from btle_tpu.tx.synth import scene_to_wideband
        from btle_tpu.wideband import WidebandConfig, WidebandSniffer

        spec = parse_descriptor(
            "38-ADV_EXT_IND-TxAdd-0-RxAdd-0-AdvMode-0"
            "-AdvA-A1B2C3D4E5F6-AdvData-CAFE-Space-1")
        wi, wq = scene_to_wideband([(spec, 9_000)], 200_000,
                                   noise_std=0.05)
        pkts = [p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
                if p.crc_ok and p.channel == 38]
        assert pkts
        p = pkts[0]
        assert p.header.pdu_type == AdvPduType.ADV_EXT_IND
        assert p.payload.ext is not None
        assert p.payload.adv_a == bytes.fromhex("a1b2c3d4e5f6")


class TestSyncInfo:
    def test_build_parse_roundtrip(self):
        from btle_tpu.ll.pdu import build_sync_info, parse_sync_info

        si = build_sync_info(3000, 20000,
                             bytes([0x1F, 0xFF, 0xFF, 0xFF, 0xFF]), 5,
                             0x60850A1B, 0xA77B22, 0x1234)
        p = parse_sync_info(si)
        assert (p.sync_offset_us, p.interval_us, p.sca) == (3000, 20000, 5)
        assert p.access_addr == 0x60850A1B and p.crc_init == 0xA77B22
        assert p.event_counter == 0x1234
        assert p.chm == bytes([0x1F, 0xFF, 0xFF, 0xFF, 0xFF])
        with pytest.raises(ValueError):
            parse_sync_info(si[:-1])

    def test_periodic_train_followed_by_rekey(self, rng):
        """Wideband-native periodic advertising: the sniffer hears ALL
        channels, so following a periodic train needs no CSA#2 channel
        algorithm at all — parse the SyncInfo, re-key the data channels
        with the train's AA/CRCinit (the ble_send_cmd register path),
        and the AUX_SYNC_INDs decode wherever they hop."""
        from btle_tpu.golden import model as G
        from btle_tpu.ll.pdu import (build_ext_adv_payload, build_sync_info,
                                     parse_adv_header, parse_adv_payload,
                                     parse_sync_info)
        from btle_tpu.stream.control import REG_ACCESS_ADDR, REG_CRC_INIT
        from btle_tpu.tx.synth import scene_to_wideband
        from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                                       synthesize_wideband)

        per_aa = 0x71764129
        per_crc = 0x555555           # keep the default table for synthesis
        sync = build_sync_info(2400, 30000, bytes([0x1F] + [0xFF] * 4), 0,
                               per_aa, per_crc, 7)
        ext = build_ext_adv_payload(adv_mode=0,
                                    adv_a=bytes.fromhex("0a0b0c0d0e0f"),
                                    sync_info=sync)
        pdu = B.bytes_to_bits(np.frombuffer(
            bytes([0x07, len(ext)]) + ext, np.uint8))

        n = 600_000
        wi, wq = synthesize_wideband(
            {38: G.gfsk_modulate_float(G.assemble_phy_bits(pdu, 38), 80)},
            n, {38: 4_000 * 80})
        # the periodic train: AUX_SYNC_INDs on two different data
        # channels, framed with the train's OWN access address
        train_payload = build_ext_adv_payload(adv_mode=0,
                                              adv_data=b"\x55" * 6)
        tp = B.bytes_to_bits(np.frombuffer(
            bytes([0x07, len(train_payload)]) + train_payload, np.uint8))
        aa_hex = int(per_aa).to_bytes(4, "little").hex()
        for ch, t_us in ((11, 6_400), (29, 5_200)):
            si, sq = synthesize_wideband(
                {ch: G.gfsk_modulate_float(
                    G.assemble_phy_bits(tp, ch, access_address_hex=aa_hex),
                    80)}, n, {ch: t_us * 80})
            wi += si
            wq += sq

        sn = WidebandSniffer(WidebandConfig())
        pkts1 = sn.run(wi, wq)
        ext_pkts = [p for p in pkts1 if p.crc_ok and p.channel == 38]
        assert ext_pkts
        pl = parse_adv_payload(bytes(ext_pkts[0].pdu_bytes[2:]),
                               parse_adv_header(
                                   bytes(ext_pkts[0].pdu_bytes[:2])).pdu_type)
        info = parse_sync_info(pl.ext.sync_info)
        assert info.access_addr == per_aa

        # re-key the data channels with the sniffed train keys and rescan
        sn2 = WidebandSniffer(WidebandConfig())
        sn2.apply_control_registers([(REG_ACCESS_ADDR, info.access_addr),
                                     (REG_CRC_INIT, info.crc_init)])
        got = [p for p in sn2.run(wi, wq)
               if p.crc_ok and p.channel in (11, 29)]
        assert {p.channel for p in got} == {11, 29}
        assert all(p.access_addr == per_aa for p in got)
