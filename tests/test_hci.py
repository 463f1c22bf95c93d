"""Serial/UART HCI transport (stream/hci.py): the byte-stream control
path of the chip (btle_ll.v uart_frame_rx/tx + register bridge).

Covers the bit-level UART serializer contract (8N1/8E1/8O1 framing,
parity error detection), the byte-pipe message codec (split delivery,
garbage resync, CRC rejection), and the end-to-end capability: an
external process retunes a RUNNING sniffer through a REAL serial device
(a pty pair) carrying the same register protocol as the UDP channel.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.stream.control import (REG_CHANNEL, decode_reg_writes,
                                     encode_reg_writes)
from btle_tpu.stream.hci import (HciFrameCodec, SerialControlServer,
                                 UartFramer, crc8, send_command_serial)


class TestUartFramer:
    @pytest.mark.parametrize("parity", ["none", "even", "odd"])
    def test_roundtrip_all_bytes(self, parity):
        f = UartFramer(parity=parity)
        data = bytes(range(256))
        got, errors = f.decode(f.encode(data))
        assert got == data
        assert errors == 0

    def test_parity_flip_detected(self):
        f = UartFramer(parity="even")
        levels = f.encode(b"\xa5")
        # flip one DATA bit: parity check must reject the frame
        start = int(np.flatnonzero(np.asarray(levels) == 0)[0])
        levels = np.asarray(levels).copy()
        levels[start + 3] ^= 1
        got, errors = f.decode(levels)
        assert got == b"" and errors == 1

    def test_stop_bit_low_is_frame_error(self):
        f = UartFramer()
        levels = np.asarray(f.encode(b"\x12")).copy()
        start = int(np.flatnonzero(levels == 0)[0])
        levels[start + 9] = 0          # stop bit
        got, errors = f.decode(levels)
        assert got == b"" and errors == 1

    def test_idle_line_decodes_nothing(self):
        got, errors = UartFramer().decode(np.ones(100, np.int8))
        assert got == b"" and errors == 0


class TestHciFrameCodec:
    def test_split_delivery(self):
        frame = HciFrameCodec.encode(encode_reg_writes([(11, 38), (10, 7)]))
        codec = HciFrameCodec()
        payloads = []
        for k in range(len(frame)):
            payloads += codec.feed(frame[k : k + 1])
        assert len(payloads) == 1
        assert decode_reg_writes(payloads[0]) == [(11, 38), (10, 7)]
        assert codec.frame_errors == 0

    def test_garbage_resync(self):
        frame = HciFrameCodec.encode(encode_reg_writes([(12, 0x555555)]))
        codec = HciFrameCodec()
        payloads = codec.feed(b"\x00\xff\xb7" + frame + b"\x13")
        assert len(payloads) == 1
        assert decode_reg_writes(payloads[0]) == [(12, 0x555555)]

    def test_crc_rejected_then_resync(self):
        good = HciFrameCodec.encode(encode_reg_writes([(11, 5)]))
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        codec = HciFrameCodec()
        payloads = codec.feed(bytes(bad) + good)
        assert len(payloads) == 1
        assert codec.frame_errors >= 1

    def test_crc8_known_value(self):
        # CRC-8/ATM of "123456789" is 0xF4 (standard check value)
        assert crc8(b"123456789") == 0xF4


class TestSerialEndToEnd:
    def test_pty_retunes_running_sniffer(self, rng):
        """ch37 packet in block 0; a serial write retunes to ch38 between
        blocks; the ch38 packet decodes — same scenario as the UDP
        control test, riding a REAL serial device (pty pair)."""
        from btle_tpu.golden import model as G
        from btle_tpu.rx.pipeline import required_halo
        from btle_tpu.spec import bits as B
        from btle_tpu.stream import Sniffer, SnifferConfig

        def packet_iq(ch, payload):
            pdu = B.bytes_to_bits(np.concatenate(
                [[0x42, len(payload)], payload]).astype(np.uint8))
            ci, cq, _ = G.btle_tx(pdu, ch, sps=4, flavor="c")
            return ci.astype(np.int16), cq.astype(np.int16)

        scan_len = 4096
        pay37 = rng.integers(0, 256, 8, dtype=np.uint8)
        pay38 = rng.integers(0, 256, 8, dtype=np.uint8)

        def seg(iq, lead, total):
            i = np.zeros(total, np.int16)
            q = np.zeros(total, np.int16)
            i[lead : lead + len(iq[0])] = iq[0]
            q[lead : lead + len(iq[1])] = iq[1]
            return i, q

        chunk1 = seg(packet_iq(37, pay37), 500,
                     scan_len + required_halo(4, 1))
        chunk2 = seg(packet_iq(38, pay38), 700, 3 * scan_len)

        import tty

        master, slave = os.openpty()
        tty.setraw(master)             # binary-clean: no echo/CRNL cooking
        tty.setraw(slave)
        try:
            server = SerialControlServer(slave)
            sn = Sniffer(SnifferConfig(channel=37, scan_len=scan_len),
                         quiet_text=True, control=server)

            def source():
                yield chunk1
                sent = send_command_serial(master, channel=38)
                assert sent == 1
                yield chunk2

            events = sn.run(source())
        finally:
            os.close(master)
            os.close(slave)
        ok = [e for e in events if e.crc_ok]
        assert [e.channel for e in ok] == [37, 38]
        assert bytes(ok[1].payload_bytes) == bytes(pay38)
        assert server.registers[REG_CHANNEL] == 38
        assert server.frame_errors == 0
