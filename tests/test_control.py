"""Live control channel (ble_send_cmd parity): retune a RUNNING sniffer
from another process/socket — channel, access address, CRC init — and
decode packets on the new settings (reference capability:
host/ble_fpga_ctl/ble_send_cmd.c:1-438, register map :340-363)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.stream import Sniffer, SnifferConfig
from btle_tpu.stream.control import (
    REG_ACCESS_ADDR,
    REG_CHANNEL,
    REG_CRC_INIT,
    ControlServer,
    decode_reg_writes,
    encode_reg_writes,
    parse_register_file,
    send_command,
)


def _packet_iq(channel, payload, sps=4, crc_init_hex="555555",
               aa_hex="d6be898e"):
    hdr = 0x40 if channel in (37, 38, 39) else 0x01
    pdu = B.bytes_to_bits(np.concatenate(
        [[hdr, len(payload)], payload]).astype(np.uint8))
    phy = G.assemble_phy_bits(pdu, channel, crc_init_hex=crc_init_hex,
                              access_address_hex=aa_hex)
    i, q = G.gfsk_modulate_c(phy, sps)
    return i.astype(np.int16) * 64, q.astype(np.int16) * 64


class TestWireFormat:
    def test_roundtrip(self):
        writes = [(REG_CHANNEL, 38), (REG_CRC_INIT, 0x555555),
                  (REG_ACCESS_ADDR, 0x8E89BED6), (7, 123)]
        assert decode_reg_writes(encode_reg_writes(writes)) == writes

    def test_garbage_tolerated(self):
        payload = encode_reg_writes([(REG_CHANNEL, 39)]) + b"\x01\x02"
        assert decode_reg_writes(payload) == [(REG_CHANNEL, 39)]

    def test_register_file(self, tmp_path):
        f = tmp_path / "regs.txt"
        f.write_text("# comment\n11 38\n12 0x555555  # crc\n\n10 0x8E89BED6\n")
        assert parse_register_file(f) == [
            (11, 38), (12, 0x555555), (10, 0x8E89BED6)]


class TestLiveRetune:
    def test_channel_change_mid_stream(self, rng):
        """First block carries a ch37 packet; a send_command() retunes to
        ch38 between blocks; the second packet (ch38 whitening) must then
        decode — without the retune it cannot (wrong whitening)."""
        scan_len = 4096
        pay37 = rng.integers(0, 256, 8, dtype=np.uint8)
        pay38 = rng.integers(0, 256, 8, dtype=np.uint8)
        i37, q37 = _packet_iq(37, pay37)
        i38, q38 = _packet_iq(38, pay38)

        def seg(iq, lead, total):
            i = np.zeros(total, np.int16)
            q = np.zeros(total, np.int16)
            i[lead:lead + len(iq[0])] = iq[0]
            q[lead:lead + len(iq[1])] = iq[1]
            return i, q

        from btle_tpu.rx.pipeline import required_halo

        # chunk1 covers exactly block 0 (territory + halo) so the block
        # iterator doesn't pull chunk2 — and fire the command — until
        # block 0 has been processed
        chunk1 = seg((i37, q37), 500, scan_len + required_halo(4, 1))
        chunk2 = seg((i38, q38), 700, 3 * scan_len)      # later blocks

        server = ControlServer(port=0)
        cfg = SnifferConfig(channel=37, scan_len=scan_len)
        sn = Sniffer(cfg, quiet_text=True, control=server)

        def source():
            yield chunk1
            # the sniffer has NOT yet consumed block 0; commands queue on
            # the socket and apply at the next block boundary
            sent = send_command(server.port, channel=38)
            assert sent == 1
            yield chunk2

        try:
            events = sn.run(source())
        finally:
            server.close()
        ok = [e for e in events if e.crc_ok]
        assert [e.channel for e in ok] == [37, 38]
        assert bytes(ok[0].payload_bytes) == bytes(
            np.concatenate([pay37]).tobytes())
        assert bytes(ok[1].payload_bytes) == bytes(pay38)
        assert server.registers[REG_CHANNEL] == 38

    def test_without_retune_second_packet_lost(self, rng):
        scan_len = 4096
        i38, q38 = _packet_iq(38, rng.integers(0, 256, 8, dtype=np.uint8))
        i = np.zeros(2 * scan_len, np.int16)
        q = np.zeros(2 * scan_len, np.int16)
        i[scan_len + 700:scan_len + 700 + len(i38)] = i38
        q[scan_len + 700:scan_len + 700 + len(q38)] = q38
        sn = Sniffer(SnifferConfig(channel=37, scan_len=scan_len),
                     quiet_text=True)
        events = sn.run(iter([(i, q)]))
        assert not any(e.crc_ok for e in events)

    def test_aa_and_crc_retune(self, rng):
        """Re-keying AA + CRC init mid-stream decodes a data-channel-style
        packet with sniffed parameters (ble_send_cmd -a/-c)."""
        scan_len = 4096
        aa_hex = "50654a9b"
        crc_hex = "abcdef"
        pay = rng.integers(0, 256, 8, dtype=np.uint8)
        ip, qp = _packet_iq(37, pay, crc_init_hex=crc_hex, aa_hex=aa_hex)
        i = np.zeros(3 * scan_len, np.int16)
        q = np.zeros(3 * scan_len, np.int16)
        i[scan_len + 600:scan_len + 600 + len(ip)] = ip
        q[scan_len + 600:scan_len + 600 + len(qp)] = qp

        server = ControlServer(port=0)
        sn = Sniffer(SnifferConfig(channel=37, scan_len=scan_len),
                     quiet_text=True, control=server)

        def source():
            yield i[:scan_len], q[:scan_len]
            send_command(server.port,
                         access_addr=int.from_bytes(
                             bytes.fromhex(aa_hex), "little"),
                         crc_init=int(crc_hex, 16))
            yield i[scan_len:], q[scan_len:]

        try:
            events = sn.run(source())
        finally:
            server.close()
        ok = [e for e in events if e.crc_ok]
        assert len(ok) == 1
        assert bytes(ok[0].payload_bytes) == bytes(pay)


class TestDwellRotation:
    def test_rotate_scan_decodes_all_three_adv_channels(self, rng):
        """The reference CLI scan rotates 37->38->39 with a dwell on a
        live radio (btle_cli cli.py:115-178); here the rotation runs on
        the stream clock: one packet per channel, each placed inside the
        dwell window where its channel is active, all three decode."""
        sps = 4
        dwell_ms = 4            # 4 ms = 16000 samples at 4 Msps
        scan_len = 4096
        dwell_samples = dwell_ms * 1000 * sps // 1
        total = 4 * dwell_samples
        i = np.zeros(total, np.int16)
        q = np.zeros(total, np.int16)
        payloads = {}
        for k, ch in enumerate((37, 38, 39)):
            pay = rng.integers(0, 256, 8, dtype=np.uint8)
            payloads[ch] = pay
            pi, pq = _packet_iq(ch, pay, sps=sps)
            # middle of dwell window k (rotation fires at block edges,
            # so keep clear of the window boundaries)
            at = k * dwell_samples + dwell_samples // 2
            i[at:at + len(pi)] = pi
            q[at:at + len(pq)] = pq

        cfg = SnifferConfig(rotate_channels=(37, 38, 39), dwell_ms=dwell_ms,
                            scan_len=scan_len)
        sn = Sniffer(cfg, quiet_text=True)
        events = sn.run(iter([(i, q)]))
        ok = [(e.channel, bytes(e.payload_bytes)) for e in events if e.crc_ok]
        assert ok == [(ch, bytes(payloads[ch])) for ch in (37, 38, 39)]

    def test_rotate_and_hop_exclusive(self):
        with pytest.raises(ValueError):
            Sniffer(SnifferConfig(rotate_channels=(37, 38), hop=True),
                    quiet_text=True)
