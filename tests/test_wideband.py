"""Wideband channelizer + 40-channel sniffer tests (BASELINE config 4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.wideband import (
    D,
    M,
    WidebandSniffer,
    bin_to_channel,
    channel_to_bin,
    channelize,
    prototype_filter,
    synthesize_wideband,
)


def make_channel_burst(rng, ch, n_payload=12):
    hdr_byte = 0x40 if ch in (37, 38, 39) else 0x01
    payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
    pdu = B.bytes_to_bits(
        np.concatenate([[hdr_byte, n_payload], payload]).astype(np.uint8)
    )
    phy = G.assemble_phy_bits(pdu, ch)
    i80, q80 = G.gfsk_modulate_float(phy, 80)
    return (i80, q80), B.bits_to_bytes(pdu)


class TestChannelizer:
    def test_bin_mapping_roundtrip(self):
        for ch in range(40):
            assert bin_to_channel(channel_to_bin(ch)) == ch

    def test_prototype_filter_spec(self):
        """Passband within 0.8 MHz, strong stopband past 1.2 MHz (the role
        of the reference AD9361 profile pass0.8_stop1.1)."""
        h = prototype_filter()
        f = np.fft.rfftfreq(1 << 16, d=1 / 80.0)
        H = np.abs(np.fft.rfft(h, 1 << 16))
        H /= H[0]
        pass_ripple = 20 * np.log10(H[(f <= 0.8)].min())
        stop = 20 * np.log10(H[(f >= 1.2)].max())
        assert pass_ripple > -3.0
        assert stop < -50.0

    def test_tone_lands_in_correct_bin(self):
        n = np.arange(40000)
        for ch in (37, 0, 36, 39):
            grid = channel_to_bin(ch)
            f_off = (2402 + 2 * ((channel_to_bin(ch) - 20) % 40) - 2442)
            # compute offset directly from channel definition instead
            from btle_tpu.spec.channels import CHANNEL_TO_GRID
            f_off = 2402 + 2 * int(CHANNEL_TO_GRID[ch]) - 2442
            x = np.exp(1j * 2 * np.pi * (f_off / 80.0) * n)
            yi, yq = channelize(jnp.asarray(x.real.astype(np.float32)),
                                jnp.asarray(x.imag.astype(np.float32)))
            en = np.asarray(yi) ** 2 + np.asarray(yq) ** 2
            # skip filter warm-up
            best = int(np.argmax(en[:, 50:].sum(axis=1)))
            assert best == channel_to_bin(ch), (ch, best)

    def test_output_rate(self):
        yi, yq = channelize(jnp.zeros(8000, jnp.float32), jnp.zeros(8000, jnp.float32))
        assert yi.shape == (M, 8000 // D)


class TestWidebandSniffer:
    def test_multi_channel_decode(self, rng):
        signals, expected, offsets = {}, {}, {}
        chans = (37, 38, 39, 0, 9, 17, 25, 36)
        for k, ch in enumerate(chans):
            signals[ch], expected[ch] = make_channel_burst(rng, ch)
            offsets[ch] = 4000 + 22000 * k
        wi, wq = synthesize_wideband(signals, 250000, offsets)
        sn = WidebandSniffer()
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        assert sorted(p.channel for p in pkts) == sorted(chans)
        for p in pkts:
            np.testing.assert_array_equal(p.pdu_bytes, expected[p.channel])

    def test_simultaneous_packets(self, rng):
        """Same time slot on far-apart channels — true parallel sniffing."""
        signals, expected = {}, {}
        chans = (37, 11, 39)
        for ch in chans:
            signals[ch], expected[ch] = make_channel_burst(rng, ch, n_payload=20)
        wi, wq = synthesize_wideband(signals, 80000, {ch: 2000 for ch in chans})
        sn = WidebandSniffer()
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        assert sorted(p.channel for p in pkts) == sorted(chans)
        for p in pkts:
            np.testing.assert_array_equal(p.pdu_bytes, expected[p.channel])

    def test_adjacent_channel_rejection(self, rng):
        """A strong packet on one channel must not decode on neighbours."""
        signals = {}
        (sig, exp) = make_channel_burst(rng, 17)
        signals[17] = (sig[0] * 4, sig[1] * 4)
        wi, wq = synthesize_wideband(signals, 60000, {17: 2000})
        sn = WidebandSniffer()
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        assert [p.channel for p in pkts] == [17]

    def test_parse_attached(self, rng):
        signals = {}
        payload = np.concatenate([
            np.frombuffer(bytes.fromhex("060504030201"), np.uint8),
            np.array([2, 0x01, 0x06], np.uint8),
        ])
        pdu = B.bytes_to_bits(
            np.concatenate([[0x40, len(payload)], payload]).astype(np.uint8)
        )
        phy = G.assemble_phy_bits(pdu, 38)
        signals[38] = G.gfsk_modulate_float(phy, 80)
        wi, wq = synthesize_wideband(signals, 60000, {38: 3000})
        pkts = [p for p in WidebandSniffer().run(wi, wq) if p.crc_ok]
        assert len(pkts) == 1
        p = pkts[0]
        assert p.header.pdu_type == 0
        assert p.payload.adv_a == bytes.fromhex("010203040506")


class TestBlockBoundary:
    @pytest.mark.parametrize("rel", [-34, -20, -10, -2, 2, 30])
    def test_aa_at_block_boundary_decodes(self, rng, rel):
        """Packets whose access address lands right at (either side of) a
        streaming block boundary must decode: block t defers the hit to
        block t+1, whose channelizer now starts from carried filter
        history instead of zero-padding (regression for the warm-up-loss
        bug found in review)."""
        scan_len = 2048
        sig, exp = make_channel_burst(rng, 17, n_payload=12)
        # place the AA start at channel sample scan_len + rel
        # (AA begins after 8 preamble symbols = 8 ch-samples*4? preamble is
        # 8 bits = 32 ch-samples at 4 Msps; wideband start accounts for it)
        aa_ch_pos = scan_len + rel
        start_wb = (aa_ch_pos - 32) * 20
        n = 3 * scan_len * 20
        wi, wq = synthesize_wideband({17: sig}, n, {17: start_wb})
        from btle_tpu.wideband import WidebandConfig

        sn = WidebandSniffer(WidebandConfig(scan_len_ch=scan_len))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok and p.channel == 17]
        assert len(pkts) == 1, f"boundary rel={rel}"
        np.testing.assert_array_equal(pkts[0].pdu_bytes, exp)


class TestSlotExhaustion:
    def test_rescan_recovers_truncated_channel(self, rng):
        """More packets in one channel per block than candidate slots:
        the sniffer must rescan from the consumed cursor and still emit
        every packet (wideband analog of stream_decode's rescan)."""
        n_pkts = 8
        bursts = []
        expected = []
        gap = np.zeros(6000, np.float32)  # 300 ch-samples between packets
        for _ in range(n_pkts):
            (bi, bq), pdu = make_channel_burst(rng, 9, n_payload=6)
            bursts.append((bi, bq))
            expected.append(pdu)
        sig_i = np.concatenate([x for b in bursts for x in (b[0], gap)])
        sig_q = np.concatenate([x for b in bursts for x in (b[1], gap)])
        n = len(sig_i) + 120000
        wi, wq = synthesize_wideband({9: (sig_i, sig_q)}, n, {9: 4000})

        from btle_tpu.wideband import WidebandConfig

        # plenty of slots: baseline packet set, no truncation
        ref = WidebandSniffer(WidebandConfig(max_candidates=32))
        ref_pkts = [p for p in ref.run(wi, wq) if p.crc_ok]
        assert len(ref_pkts) == n_pkts
        assert ref.truncated_channels == 0

        # starved slots: rescans must recover the identical packet set
        starved = WidebandSniffer(WidebandConfig(max_candidates=2))
        got = [p for p in starved.run(wi, wq) if p.crc_ok]
        assert starved.truncated_channels > 0
        assert [(p.channel, p.sample_pos) for p in got] == \
               [(p.channel, p.sample_pos) for p in ref_pkts]
        for p, exp in zip(got, expected):
            np.testing.assert_array_equal(p.pdu_bytes, exp)
