"""AUX chain linking on the wideband path (ll/extchain.py).

The reference's single radio must retune to chase an AuxPtr; the
40-channel sniffer already hears the secondary channel, so the chain
links by (channel, ADI, time window) bookkeeping alone.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.ll.extchain import AuxChainLinker
from btle_tpu.ll.pdu import build_ext_adv_payload
from btle_tpu.spec import bits as B
from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                               synthesize_wideband)


def ext_pdu(payload: bytes) -> np.ndarray:
    hdr = bytes([0x07, len(payload)])
    return B.bytes_to_bits(np.frombuffer(hdr + payload, np.uint8))


def burst(pdu_bits, ch):
    return G.gfsk_modulate_float(G.assemble_phy_bits(pdu_bits, ch), 80)


def test_aux_pointer_links_across_channels(rng):
    adv_a = bytes.fromhex("0a0b0c0d0e0f")
    offset_us = 1200
    t0_us = 2_000
    aux_ch = 12

    primary = build_ext_adv_payload(
        adv_mode=0, adv_a=adv_a, adi=(0x234, 3),
        aux_ptr=(aux_ch, 0, offset_us, 0))
    aux = build_ext_adv_payload(
        adv_mode=0, adv_a=adv_a, adi=(0x234, 3),
        adv_data=bytes.fromhex("0201060318ffee"))
    # decoy: same channel, WRONG ADI, inside the window — must not link
    decoy = build_ext_adv_payload(adv_mode=0, adv_a=adv_a, adi=(0x777, 1))

    n = 600_000
    wi = np.zeros(n, np.float32)
    wq = np.zeros(n, np.float32)
    for ch, payload, t_us in ((37, primary, t0_us),
                              (aux_ch, decoy, t0_us + offset_us + 2_000),
                              (aux_ch, aux, t0_us + offset_us)):
        si, sq = synthesize_wideband({ch: burst(ext_pdu(payload), ch)}, n,
                                     {ch: t_us * 80})
        wi += si
        wq += sq
    wi += rng.normal(0, 0.02, n).astype(np.float32)
    wq += rng.normal(0, 0.02, n).astype(np.float32)

    pkts = [p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
            if p.crc_ok]
    assert {p.channel for p in pkts} == {37, aux_ch}

    linker = AuxChainLinker()
    links = linker.feed(pkts)
    assert len(links) == 1
    lk = links[0]
    assert lk.primary.channel == 37 and lk.aux.channel == aux_ch
    assert (lk.did, lk.sid) == (0x234, 3)
    assert abs(lk.offset_error_us) <= 650
    # the linked aux carries the real AdvData
    from btle_tpu.ll.pdu import AdvPduType, parse_adv_header, parse_adv_payload

    hdr = parse_adv_header(bytes(lk.aux.pdu_bytes[:2]))
    pl = parse_adv_payload(bytes(lk.aux.pdu_bytes[2:]), hdr.pdu_type)
    assert bytes(pl.data) == bytes.fromhex("0201060318ffee")


def test_two_hop_chain(rng):
    """ADV_EXT_IND -> AUX_ADV_IND (with its own AuxPtr) -> AUX_CHAIN_IND."""
    adv_a = bytes.fromhex("102030405060")
    p1 = build_ext_adv_payload(adv_mode=0, adi=(0x111, 2),
                               aux_ptr=(9, 0, 900, 0))
    p2 = build_ext_adv_payload(adv_mode=0, adv_a=adv_a, adi=(0x111, 2),
                               aux_ptr=(21, 0, 1500, 0),
                               adv_data=b"\xaa" * 8)
    p3 = build_ext_adv_payload(adv_mode=0, adi=(0x111, 2),
                               adv_data=b"\xbb" * 8)
    n = 800_000
    wi = np.zeros(n, np.float32)
    wq = np.zeros(n, np.float32)
    for ch, payload, t_us in ((38, p1, 1_500), (9, p2, 2_400),
                              (21, p3, 3_900)):
        si, sq = synthesize_wideband({ch: burst(ext_pdu(payload), ch)}, n,
                                     {ch: t_us * 80})
        wi += si
        wq += sq
    pkts = [p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
            if p.crc_ok]
    links = AuxChainLinker().feed(pkts)
    assert len(links) == 2
    assert [(l.primary.channel, l.aux.channel) for l in links] \
        == [(38, 9), (9, 21)]
