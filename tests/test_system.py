"""System scenario: a simulated BLE airspace — three advertisers on the
three ADV channels, a connection forming (CONNECT_REQ) and LL control
traffic on hopped data channels — decoded end-to-end by the wideband
follower and summarized by the recon layer."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.cli.aggregate import ScanAggregator
from btle_tpu.cli.events import PktEvent
from btle_tpu.cli.recon import quickscan
from btle_tpu.golden import model as G
from btle_tpu.ll import LlCtrlOpcode, LlPduType
from btle_tpu.spec import bits as B
from btle_tpu.wideband import WidebandConfig, WidebandSniffer, synthesize_wideband

from test_hop import CONN_AA, CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu


def adv_ind(adv_a_hex: str, name: bytes, mfg: bytes | None = None):
    payload = list(bytes.fromhex(adv_a_hex)[::-1])
    payload += [2, 0x01, 0x06]
    payload += [len(name) + 1, 0x09, *name]
    if mfg:
        payload += [len(mfg) + 1, 0xFF, *mfg]
    hdr = [0x40, len(payload)]
    return B.bytes_to_bits(np.array(hdr + payload, np.uint8))


def burst(pdu, ch, **kw):
    phy = G.assemble_phy_bits(pdu, ch, **kw)
    return G.gfsk_modulate_float(phy, 80)


def ll_ctrl(body: bytes):
    return B.bytes_to_bits(np.frombuffer(bytes([0x03, len(body)]) + body, np.uint8))


def test_full_airspace_scenario(rng):
    block = 8192 * 20
    n = 3 * block
    wi = np.zeros(n, np.float32)
    wq = np.zeros(n, np.float32)

    devices = {
        37: ("aabbccddeeff", b"SensorTag", bytes([0x59, 0x00, 1, 2])),
        38: ("102030405060", b"Beacon-X", bytes([0x4C, 0x00, 0x02, 0x15])),
        39: ("0a0b0c0d0e0f", b"tpu-node", None),
    }
    expected_pdus = {}
    for k, (ch, (mac, name, mfg)) in enumerate(devices.items()):
        pdu = adv_ind(mac, name, mfg)
        expected_pdus[ch] = B.bits_to_bytes(pdu)
        si, sq = synthesize_wideband({ch: burst(pdu, ch)}, n, {ch: 10_000 + 30_000 * k})
        wi += si
        wq += sq

    # connection forms in block 0 on ch37
    cr = connect_req_pdu()
    si, sq = synthesize_wideband({37: burst(cr, 37)}, n, {37: 120_000})
    wi += si
    wq += sq

    conn_kw = dict(crc_init_hex=CRC_INIT_HEX, access_address_hex=CONN_AA_HEX)
    ll_msgs = {
        9: ll_ctrl(bytes([0x0C, 7]) + (0x59).to_bytes(2, "little")
                   + (0x1234).to_bytes(2, "little")),            # VERSION_IND
        18: ll_ctrl(bytes([0x01]) + bytes.fromhex("1FFFFFFFFF")[::-1]
                    + (6).to_bytes(2, "little")),                # CHANNEL_MAP_REQ
        27: B.bytes_to_bits(np.frombuffer(b"\x01\x05hello", np.uint8)),  # LL_DATA
    }
    for k, (ch, pdu) in enumerate(ll_msgs.items()):
        si, sq = synthesize_wideband(
            {ch: burst(pdu, ch, **conn_kw)}, n, {ch: block + 40_000 + 60_000 * k})
        wi += si
        wq += sq

    sn = WidebandSniffer(WidebandConfig(follow_connections=True))
    pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
    by_ch = {}
    for p in pkts:
        by_ch.setdefault(p.channel, []).append(p)

    # all three advertisers decoded bit-exactly
    for ch, exp in expected_pdus.items():
        assert any(np.array_equal(p.pdu_bytes, exp) for p in by_ch[ch]), ch
    # the connection was followed and its LL traffic decoded
    assert sn.connection.access_addr == CONN_AA
    assert by_ch[9][0].payload.ctrl.opcode == LlCtrlOpcode.LL_VERSION_IND
    assert by_ch[9][0].payload.ctrl.fields["comp_id"] == 0x59
    assert by_ch[18][0].payload.ctrl.fields["instant"] == 6
    assert by_ch[27][0].header.llid == LlPduType.LL_DATA1
    assert by_ch[27][0].pdu_bytes[2:].tobytes() == b"hello"

    # recon over the ADV traffic
    agg = ScanAggregator()
    for p in pkts:
        if p.channel not in (37, 38, 39) or p.header is None:
            continue
        from btle_tpu.ll import extract_adv_a

        adv_a = extract_adv_a(p.payload, p.header.pdu_type) if p.payload else None
        agg.update(PktEvent(
            v=1, t="pkt", ts=p.sample_pos / 4e6, pkt=0, ch=p.channel,
            aa="8e89bed6", crc_ok=True, kind="adv",
            pdu_type=int(p.header.pdu_type),
            pdu_name=p.header.pdu_type.display_name,
            tx_add=p.header.tx_add, rx_add=p.header.rx_add,
            plen=p.header.payload_len,
            adv_a=":".join(f"{b:02x}" for b in adv_a) if adv_a else None,
            payload_hex=bytes(p.pdu_bytes[2:]).hex(), rssi_est=None,
        ))
    s = quickscan(agg)
    assert s.n_devices >= 3
    names = {d.name for d in s.devices_top}
    assert {"SensorTag", "Beacon-X", "tpu-node"} <= names
    vendors = {d.vendor_hint for d in s.devices_top}
    assert "Nordic Semiconductor" in vendors and "Apple" in vendors
    assert s.fingerprints_seen.get("ibeacon") == 1
