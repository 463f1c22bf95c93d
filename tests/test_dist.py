"""Multi-device sharding tests on the 8-device virtual CPU mesh
(BASELINE config 5): mesh-shape invariance, equivalence with the
single-device wideband sniffer, and boundary-straddling packets via the
ppermute halo exchange."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.dist import ShardedWidebandScan, make_mesh
from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.wideband import WidebandSniffer, synthesize_wideband

from test_wideband import make_channel_burst


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    signals, expected, offsets = {}, {}, {}
    chans = (37, 38, 0, 17, 25, 39)
    for k, ch in enumerate(chans):
        signals[ch], expected[ch] = make_channel_burst(rng, ch, n_payload=10 + k)
        offsets[ch] = 5000 + 50000 * k
    n = 320000
    wi, wq = synthesize_wideband(signals, n, offsets)
    return wi, wq, expected, chans


def _key(pkts):
    return sorted((p.channel, bytes(p.pdu_bytes).hex()) for p in pkts if p.crc_ok)


class TestShardedScan:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8), (8, 1)])
    def test_mesh_shapes_agree(self, scene, mesh_shape):
        wi, wq, expected, chans = scene
        n_ch, n_time = mesh_shape
        mesh = make_mesh(n_ch, n_time)
        scan = ShardedWidebandScan(mesh, block_wb=len(wi) // n_time)
        pkts = scan.gather_packets(scan(wi, wq))
        assert _key(pkts) == sorted(
            (ch, bytes(expected[ch]).hex()) for ch in chans
        )

    def test_matches_single_device(self, scene):
        wi, wq, expected, chans = scene
        single = WidebandSniffer()
        ref = _key(single.run(wi, wq))
        mesh = make_mesh(2, 4)
        scan = ShardedWidebandScan(mesh, block_wb=len(wi) // 4)
        got = _key(scan.gather_packets(scan(wi, wq)))
        assert got == ref

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
    def test_boundary_straddling_packet(self, mesh_shape):
        """Packets whose samples cross EVERY time-shard boundary of the
        mesh decode via the ppermute halo exchange; with n_time = 1 the
        packet sits at the (zero-halo) end of the single shard. Channels
        are spread across channel-shards so each factorization exercises
        both axes."""
        rng = np.random.default_rng(3)
        n_ch, n_time = mesh_shape
        block_wb = 60000
        n = max(n_time, 2) * block_wb
        # one packet per boundary, on different channels (and different
        # channel-shard groups); burst ~ (1+4+2+20+3)*8*80 = 19200 samples
        chans = (17, 9, 30, 2, 25, 36, 12)
        signals, offsets, expected = {}, {}, {}
        n_boundaries = max(n_time - 1, 1)
        for b in range(n_boundaries):
            ch = chans[b % len(chans)]
            sig, exp = make_channel_burst(rng, ch, n_payload=20)
            signals[ch], expected[ch] = sig, exp
            if n_time == 1:
                offsets[ch] = n - 25000  # tail of the only shard
            else:
                offsets[ch] = (b + 1) * block_wb - 9000
        wi, wq = synthesize_wideband(signals, n, offsets)
        mesh = make_mesh(n_ch, n_time)
        scan = ShardedWidebandScan(mesh, block_wb=n // n_time)
        pkts = [p for p in scan.gather_packets(scan(wi, wq)) if p.crc_ok]
        assert sorted(p.channel for p in pkts) == sorted(expected), mesh_shape
        for p in pkts:
            np.testing.assert_array_equal(p.pdu_bytes, expected[p.channel])


class TestMultiHost:
    def test_single_process_path(self, scene):
        """MultiHostWidebandScan on the 8-device virtual mesh (process
        count 1 exercises the same program as the pod deployment)."""
        from btle_tpu.dist import MultiHostWidebandScan

        wi, wq, expected, chans = scene
        scan = MultiHostWidebandScan(n_ch=2, block_wb=len(wi) // 4)
        pkts = scan.gather_packets(scan(wi, wq))
        assert _key(pkts) == sorted(
            (ch, bytes(expected[ch]).hex()) for ch in chans
        )
        assert scan.local_time_blocks == 4


class TestShardedConnectionFollow:
    @pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 2)])
    def test_slot_overflow_rescans(self, rng, mesh_shape):
        """Dense traffic: more AA hits in one (time, channel) cell than
        candidate slots. Round-4 dropped the overflow silently behind a
        counter; the sharded path must now RECOVER via rescan (single-
        device sniffer semantics) and surface the event."""
        n_pkts = 9
        bursts, expected = [], []
        gap = np.zeros(6000, np.float32)
        for _ in range(n_pkts):
            (bi, bq), pdu = make_channel_burst(rng, 9, n_payload=6)
            bursts.append((bi, bq))
            expected.append(pdu)
        sig_i = np.concatenate([x for b in bursts for x in (b[0], gap)])
        sig_q = np.concatenate([x for b in bursts for x in (b[1], gap)])
        n_time = mesh_shape[1]
        n = -(-(len(sig_i) + 200000) // (n_time * 20 * 128)) \
            * (n_time * 20 * 128)
        wi, wq = synthesize_wideband({9: (sig_i, sig_q)}, n, {9: 4000})

        mesh = make_mesh(*mesh_shape)
        # plenty of slots: the baseline packet set, no truncation
        # headroom for EVERY hit incl. 4-phase neighbors (one cell can
        # hold all 9 packets' hits when n_time = 2)
        ref = ShardedWidebandScan(mesh, block_wb=n // n_time,
                                  max_candidates=64)
        ref_pkts = [p for p in ref.gather_packets(ref(wi, wq)) if p.crc_ok]
        assert len(ref_pkts) == n_pkts
        assert ref.truncated_cells == 0

        # starved slots: rescans must recover the identical packet set
        starved = ShardedWidebandScan(mesh, block_wb=n // n_time,
                                      max_candidates=2)
        events = []
        starved.on_truncate = lambda t, m, hits: events.append((t, m, hits))
        got = [p for p in starved.gather_packets(starved(wi, wq))
               if p.crc_ok]
        assert starved.truncated_cells > 0
        from btle_tpu.wideband.channelizer import channel_to_bin

        assert events and all(m == channel_to_bin(9) for _, m, _ in events)
        assert [(p.channel, p.sample_pos) for p in got] == \
               [(p.channel, p.sample_pos) for p in ref_pkts]
        for p, exp in zip(got, expected):
            np.testing.assert_array_equal(p.pdu_bytes, exp)

    def test_connect_req_rekeys_next_step(self, rng):
        """CONNECT_REQ decoded in step 1 re-keys data channels so step 2
        hears the connection (hop tracking across the sharded stream)."""
        from test_hop import CONN_AA, CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu, data_pdu
        from btle_tpu.golden import model as G2

        mesh = make_mesh(2, 4)
        block_wb = 80000
        scan = ShardedWidebandScan(mesh, block_wb=block_wb)
        scan.enable_connection_following()

        n = 4 * block_wb
        cr80 = G2.gfsk_modulate_float(G2.assemble_phy_bits(connect_req_pdu(), 37), 80)
        wi1, wq1 = synthesize_wideband({37: cr80}, n, {37: 30000})
        pkts1 = scan.gather_packets(scan(wi1, wq1))
        assert any(p.crc_ok and p.channel == 37 for p in pkts1)
        assert scan.connection is not None and scan.connection.access_addr == CONN_AA

        d1 = data_pdu(rng, 10)
        phy = G2.assemble_phy_bits(d1, 14, crc_init_hex=CRC_INIT_HEX,
                                   access_address_hex=CONN_AA_HEX)
        s80 = G2.gfsk_modulate_float(phy, 80)
        wi2, wq2 = synthesize_wideband({14: s80}, n, {14: 100000})
        pkts2 = [p for p in scan.gather_packets(scan(wi2, wq2)) if p.crc_ok]
        from btle_tpu.spec.bits import bits_to_bytes

        assert [p.channel for p in pkts2] == [14]
        np.testing.assert_array_equal(pkts2[0].pdu_bytes, bits_to_bytes(d1))


class TestFusedSharded:
    """Time-parallel fused sharding (Pallas front end per device)."""

    def test_fused_matches_xla_sharded(self, scene):
        from jax.experimental.pallas import tpu as pltpu

        wi, wq, expected, chans = scene
        mesh = make_mesh(1, 4)
        ref = ShardedWidebandScan(mesh, block_wb=len(wi) // 4)
        got = ShardedWidebandScan(mesh, block_wb=len(wi) // 4, fused=True,
                                  fused_tile=512, fused_dtype="f32",
                                  fused_interpret=True)
        with pltpu.force_tpu_interpret_mode():
            pr = ref.gather_packets(ref(wi, wq))
            pg = got.gather_packets(got(wi, wq))
        assert _key(pg) == _key(pr)
        assert len(_key(pr)) == len(chans)

    def test_fused_bf16x2w_sharded_packet_set(self, scene):
        """The throughput dtype rides the sharded path too: bf16x2w per
        device yields the identical CRC-OK packet set."""
        from jax.experimental.pallas import tpu as pltpu

        wi, wq, expected, chans = scene
        mesh = make_mesh(1, 4)
        ref = ShardedWidebandScan(mesh, block_wb=len(wi) // 4)
        got = ShardedWidebandScan(mesh, block_wb=len(wi) // 4, fused=True,
                                  fused_tile=512, fused_dtype="bf16x2w",
                                  fused_interpret=True)
        with pltpu.force_tpu_interpret_mode():
            pr = ref.gather_packets(ref(wi, wq))
            pg = got.gather_packets(got(wi, wq))
        assert _key(pg) == _key(pr)
        assert len(_key(pr)) == len(chans)

    def test_fused_boundary_straddling(self):
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(3)
        signals, expected = {}, {}
        signals[38], expected[38] = make_channel_burst(rng, 38, n_payload=20)
        n_time = 4
        n = 160000 * n_time
        # straddle every shard boundary
        offsets = {}
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        burst_len = len(signals[38][0])
        for b in range(1, n_time):
            s, e = synthesize_wideband({38: signals[38]}, burst_len,
                                       {38: 0})
            at = b * 160000 - burst_len // 2
            wi[at : at + burst_len] += s
            wq[at : at + burst_len] += e
        mesh = make_mesh(1, n_time)
        scan = ShardedWidebandScan(mesh, block_wb=160000, fused=True,
                                   fused_tile=512, fused_dtype="f32",
                                   fused_interpret=True)
        with pltpu.force_tpu_interpret_mode():
            pkts = scan.gather_packets(scan(wi, wq))
        ok = [p for p in pkts if p.crc_ok]
        assert len(ok) == n_time - 1
        for p in ok:
            assert bytes(p.pdu_bytes) == bytes(expected[38])

    def test_fused_requires_time_parallel_mesh(self):
        mesh = make_mesh(2, 4)
        with pytest.raises(ValueError, match="time-parallel"):
            ShardedWidebandScan(mesh, block_wb=20000, fused=True)


class TestSharded2m:
    def test_2m_scene_decodes_across_shards(self, rng):
        """LE 2M through the sharded scan (phy='2m'): the 2M burst at
        40 samples/symbol decodes on a (2, 2) mesh exactly like the
        single-chip wideband --phy 2m path."""
        from btle_tpu.tx import parse_descriptor
        from btle_tpu.tx.synth import scene_to_wideband

        specs = []
        for ch, data in ((37, "00112233"), (17, "a1b2c3")):
            if ch == 37:
                d = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0-AdvA-"
                     f"0102030405{ch:02x}-AdvData-{data}")
            else:
                d = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                     f"-DATA-{data}-CRCInit-555555")
            specs.append(parse_descriptor(d).to_2m())
        placed = [(s, 30_000 + 170_000 * k) for k, s in enumerate(specs)]
        n = 400_000
        wi, wq = scene_to_wideband(placed, n, noise_std=0.01, seed=3)

        mesh = make_mesh(2, 2)
        scan = ShardedWidebandScan(mesh, block_wb=n // 2, phy="2m")
        pkts = scan.gather_packets(scan(wi, wq))
        got = _key(pkts)
        want = sorted(
            (s.channel,
             bytes(B.bits_to_bytes(s.info_bits[s.pdu_start:])).hex())
            for s in specs)
        assert got == want, (got, want)

    def test_unknown_phy_rejected(self):
        mesh = make_mesh(1, 2)
        with pytest.raises(ValueError):
            ShardedWidebandScan(mesh, block_wb=20000, phy="2M")
