"""MCP tool bodies exercised directly (no FastMCP transport needed):
synthesize IQ with the tx chain, then drive ble_quickscan / ble_profile /
ble_capture_to_pcap / ble_diff_pcaps / ble_payload_entropy end-to-end —
the 5-tool surface of the reference mcp_server.py (docs/MCP.md)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.cli.mcp_server import (
    TOOLS,
    ble_capture_to_pcap,
    ble_diff_pcaps,
    ble_payload_entropy,
    ble_profile,
    ble_quickscan,
)

ADV_A = "0a:0b:0c:0d:0e:0f"


def _capture(tmp_path, name, mfg_counter=0):
    """Synthesize a two-packet ch37 capture via the descriptor DSL."""
    from btle_tpu.tx import parse_descriptor_sequence, synthesize

    mfg = f"ffff{mfg_counter:02x}42"
    desc = (f"37-DISCOVERY-TxAdd-0-RxAdd-0-AdvA-0a0b0c0d0e0f"
            f"-LOCAL_NAME09-Lamp-MANUF_DATA-{mfg}")
    specs, _ = parse_descriptor_sequence([desc, desc])
    pkts = synthesize(specs, flavor="c", sps=4)
    gap = np.zeros(4000, np.int16)
    i = np.concatenate([np.concatenate([p.i.astype(np.int16) * 32, gap])
                        for p in pkts])
    q = np.concatenate([np.concatenate([p.q.astype(np.int16) * 32, gap])
                        for p in pkts])
    inter = np.empty(2 * len(i), np.int16)
    inter[0::2] = i
    inter[1::2] = q
    path = tmp_path / name
    inter.tofile(path)
    return str(path)


@pytest.fixture(scope="module")
def iq_file(tmp_path_factory):
    return _capture(tmp_path_factory.mktemp("mcp"), "cap.bin")


class TestToolBodies:
    def test_quickscan(self, iq_file):
        out = ble_quickscan(iq_file, fmt="i16", channel=37, sps=4)
        assert out["n_devices"] == 1
        assert out["devices_top"][0]["adv_a"] == ADV_A
        assert out["devices_top"][0]["name"] == "Lamp"
        assert out["n_packets"] >= 2

    def test_profile(self, iq_file):
        out = ble_profile(ADV_A, iq_file=iq_file, fmt="i16", channel=37)
        assert out["adv_a"] == ADV_A
        assert out["name"] == "Lamp"
        assert out["mfg_id"] == 0xFFFF
        assert out["n_packets"] >= 2

    def test_capture_to_pcap_and_profile_from_pcap(self, iq_file, tmp_path):
        pcap = tmp_path / "out" / "cap.pcap"
        out = ble_capture_to_pcap(iq_file, str(pcap), fmt="i16", channel=37)
        assert out["n_crc_ok"] >= 2 and pcap.exists()
        prof = ble_profile(ADV_A, pcap=str(pcap))
        assert prof["name"] == "Lamp"

    def test_diff_pcaps(self, iq_file, tmp_path):
        a = tmp_path / "a.pcap"
        b = tmp_path / "b.pcap"
        ble_capture_to_pcap(iq_file, str(a), fmt="i16", channel=37)
        other = _capture(tmp_path, "cap2.bin", mfg_counter=9)
        ble_capture_to_pcap(other, str(b), fmt="i16", channel=37)
        out = ble_diff_pcaps(str(a), str(b))
        assert out["common"] == 1
        assert ADV_A in out.get("payload_changed", {})

    def test_payload_entropy(self, tmp_path):
        # three captures with a counting mfg byte -> counter position found
        from btle_tpu.stream.pcap import PcapWriter

        pcap = tmp_path / "ctr.pcap"
        w = PcapWriter(pcap)
        adva_air = bytes.fromhex(ADV_A.replace(":", ""))[::-1]
        for k in range(4):
            mfg = bytes([0xFF, 0xFF, k, 0x42])
            ad = bytes([len(mfg) + 1, 0xFF]) + mfg
            payload = adva_air + ad
            pdu = bytes([0x40, len(payload)]) + payload
            w.write_packet(pdu, 37, 0x8E89BED6, -50)
        w.close()
        out = ble_payload_entropy(str(pcap), ADV_A)
        assert out["n_samples"] == 4
        assert out["likely_counter_positions"] == [2]
        assert out["static_prefix_bytes"] == 2

    def test_iq_occupancy(self, tmp_path):
        import numpy as np

        from btle_tpu.cli.mcp_server import ble_iq_occupancy

        fs, n = 8e6, 65536
        t = np.arange(n) / fs
        z = 80 * np.exp(1j * 2 * np.pi * 1e6 * t)
        iq = np.empty(2 * n, np.int16)
        iq[0::2], iq[1::2] = z.real, z.imag
        path = tmp_path / "tone.bin"
        iq.tofile(path)
        out = ble_iq_occupancy(str(path), "i16", center_hz=2.402e9)
        assert out["n_samples"] == n and out["n_occupied"] >= 1
        top = out["occupied_bins"][0]
        assert abs(top["freq_offset_hz"] - 1e6) < fs / 256
        assert abs(top["freq_hz"] - 2.403e9) < fs / 256
        assert top["duty"] > 0.9

    def test_gatt_report(self, tmp_path):
        """ATT over a plaintext connection capture -> machine-readable
        GATT report."""
        from btle_tpu.cli.mcp_server import ble_gatt_report
        from btle_tpu.stream.pcap import PcapWriter

        att = bytes([0x1B, 0x2A, 0x00]) + b"\x45"
        frame = len(att).to_bytes(2, "little") + (4).to_bytes(2, "little") \
            + att
        pdu = bytes([0x02, len(frame)]) + frame
        path = tmp_path / "g.pcap"
        w = PcapWriter(str(path))
        w.write_packet(pdu, 9, 0x60850A1B)
        w.close()
        out = ble_gatt_report(str(path))
        assert out["n_data_pdus"] == 1
        assert out["ops"][0]["name"] == "ATT_HANDLE_VALUE_NTF"
        assert out["ops"][0]["handle"] == 0x2A

    def test_tool_registry_complete(self):
        names = {t.__name__ for t in TOOLS}
        assert names == {"ble_quickscan", "ble_profile", "ble_capture_to_pcap",
                         "ble_diff_pcaps", "ble_payload_entropy",
                         "ble_iq_occupancy", "ble_gatt_report"}
