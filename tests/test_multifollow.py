"""Multi-connection wideband following (ll.multifollow): N concurrent
connections, each owning the data channel its hop sequence currently
occupies — a capability beyond the reference's single-radio controller
(btle_rx.c:2403-2536 follows exactly one connection)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.ll.multifollow import MultiConnectionFollower
from btle_tpu.spec import bits as B
from btle_tpu.wideband import (WidebandConfig, WidebandSniffer,
                               channel_to_bin, synthesize_wideband)
from btle_tpu.wideband.sniffer import default_scan_tables

AA_1 = 0x60850A1B
AA_2 = 0x50A1B2C4
CRC_1 = "a77b22"
CRC_2 = "55aa11"


def connect_req_pdu_bytes(aa: int, crc_hex: str, hop: int, interval: int):
    payload = (
        bytes.fromhex("001830EA965F")[::-1]           # InitA
        + bytes.fromhex("90D7EBB19299")[::-1]         # AdvA
        + aa.to_bytes(4, "little")
        + bytes.fromhex(crc_hex)
        + bytes([0x02])
        + (0x000F).to_bytes(2, "little")
        + interval.to_bytes(2, "little")
        + (0).to_bytes(2, "little")
        + (0x07D0).to_bytes(2, "little")
        + bytes.fromhex("1FFFFFFFFF")[::-1]
        + bytes([hop | (5 << 5)])
    )
    return np.frombuffer(bytes([0x05, len(payload)]) + payload, np.uint8)


class FakePkt:
    def __init__(self, channel, pdu_bytes, crc_ok=True):
        self.channel = channel
        self.pdu_bytes = np.asarray(pdu_bytes, np.uint8)
        self.crc_ok = crc_ok


def _base_tables():
    _, _, _, crc_inits, _ = default_scan_tables()
    aa_rows = np.broadcast_to(
        B.hex_to_bits("d6be898e"), (40, 32)).copy().astype(np.int8)
    return aa_rows, np.asarray(crc_inits)


class TestFollowerClock:
    def test_two_connections_own_their_channels(self):
        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits, max_connections=4)
        assert f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                           adv=True, now_us=0)
        assert f.on_packet(FakePkt(38, connect_req_pdu_bytes(AA_2, CRC_2, 7, 16)),
                           adv=True, now_us=100)
        rows, crc = f.tables()
        bits1 = B.hex_to_bits(AA_1.to_bytes(4, "little").hex())
        bits2 = B.hex_to_bits(AA_2.to_bytes(4, "little").hex())
        np.testing.assert_array_equal(rows[channel_to_bin(9)], bits1)
        np.testing.assert_array_equal(rows[channel_to_bin(7)], bits2)
        # unclaimed channels keep the ADV AA (new CONNECT_REQs stay visible)
        np.testing.assert_array_equal(rows[channel_to_bin(10)],
                                      aa_rows[channel_to_bin(10)])
        from btle_tpu.spec.crc24 import crc_init_reorder
        assert crc[channel_to_bin(9)] == crc_init_reorder(
            int.from_bytes(bytes.fromhex(CRC_1), "big"))

    def test_hop_movement_rekeys_between_ticks(self):
        """After a CRC-OK packet syncs a connection, the interval clock
        moves it along its own hop sequence; each connection re-keys its
        new channel independently."""
        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits)
        f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                    adv=True, now_us=0)
        f.on_packet(FakePkt(38, connect_req_pdu_bytes(AA_2, CRC_2, 7, 8)),
                    adv=True, now_us=0)
        # sync both: data packets on their first channels
        f.on_packet(FakePkt(9, np.zeros(5, np.uint8)), adv=False, now_us=1000)
        f.on_packet(FakePkt(7, np.zeros(5, np.uint8)), adv=False, now_us=1000)
        # interval 8 * 1250 - 7000 = 3000 us; interval 16 -> 13000 us
        changed = f.on_tick(5000)
        assert changed                    # AA_2 hopped 7 -> 14; AA_1 not yet
        assert f.connections[AA_2].tracker.channel == 14
        assert f.connections[AA_1].tracker.channel == 9
        changed = f.on_tick(15000)
        assert changed                    # AA_1 hops 9 -> 18
        assert f.connections[AA_1].tracker.channel == 18
        rows, _ = f.tables()
        bits1 = B.hex_to_bits(AA_1.to_bytes(4, "little").hex())
        np.testing.assert_array_equal(rows[channel_to_bin(18)], bits1)
        # the vacated channel reverts to the ADV AA
        np.testing.assert_array_equal(rows[channel_to_bin(9)],
                                      aa_rows[channel_to_bin(9)])

    def test_capacity_and_duplicate_rejection(self):
        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits, max_connections=1)
        assert f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                           adv=True, now_us=0)
        # duplicate AA: ignored silently
        assert not f.on_packet(
            FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
            adv=True, now_us=10)
        # capacity full: rejected with an event
        assert not f.on_packet(
            FakePkt(38, connect_req_pdu_bytes(AA_2, CRC_2, 7, 16)),
            adv=True, now_us=20)
        assert f.events[-1].event == "track_reject"
        assert f.events[-1].access_addr == AA_2

    def test_stale_connection_drops_and_frees_slot(self):
        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits, max_connections=1,
                                    drop_after_intervals=3)
        f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                    adv=True, now_us=0)
        assert not f.on_tick(30000)       # < 3 * 20000 us: still tracked
        assert f.on_tick(70000)           # > 60000 us silent: dropped
        assert not f.connections
        assert f.events[-1].event == "track_drop"
        rows, crc = f.tables()
        np.testing.assert_array_equal(rows, aa_rows)
        np.testing.assert_array_equal(crc, crc_inits)
        # the freed slot accepts a new connection
        assert f.on_packet(FakePkt(38, connect_req_pdu_bytes(AA_2, CRC_2, 7, 16)),
                           adv=True, now_us=80000)

    def test_channel_collision_first_registered_wins(self):
        """Two connections landing on the same channel: the earlier one
        owns the AA row for that block; the other re-syncs later (the
        reference's own missed-dwell recovery, btle_rx.c:2497-2527)."""
        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits)
        f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                    adv=True, now_us=0)
        f.on_packet(FakePkt(38, connect_req_pdu_bytes(AA_2, CRC_2, 9, 16)),
                    adv=True, now_us=10)   # same hop: both start on ch 9
        rows, _ = f.tables()
        bits1 = B.hex_to_bits(AA_1.to_bytes(4, "little").hex())
        np.testing.assert_array_equal(rows[channel_to_bin(9)], bits1)
        assert len(f.connections) == 2     # both tracked, one dwell missed

    def test_ll_ctrl_routed_to_owning_tracker(self):
        """A sniffed LL_CHANNEL_MAP_REQ on an owned channel re-keys that
        connection's CSA#1 map (ll.hop.on_ll_ctrl routing)."""
        from types import SimpleNamespace

        aa_rows, crc_inits = _base_tables()
        f = MultiConnectionFollower(aa_rows, crc_inits)
        f.on_packet(FakePkt(37, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16)),
                    adv=True, now_us=0)                  # owns ch 9
        pkt = FakePkt(9, np.frombuffer(b"\x03\x08", np.uint8))
        pkt.payload = SimpleNamespace(ctrl=SimpleNamespace(
            opcode=0x01,
            fields={"chm": bytes.fromhex("1FFFFFFDFF"),  # mask ch 9
                    "instant": 0}))
        f.on_packet(pkt, adv=False, now_us=1000)
        t = f.connections[AA_1].tracker
        assert 9 not in t.used and len(t.used) == 36
        assert any(e.event == "chm_update" for e in f.events)


class TestWidebandMultiFollow:
    def test_two_connections_decode_concurrently(self, rng):
        """E2E: two CONNECT_REQs in block 1 (ch37 + ch38), then one data
        packet per connection in block 2 on each connection's first hop
        channel — both must decode with their own AA/CRC keys."""
        def data80(pdu, ch, crc_hex, aa):
            phy = G.assemble_phy_bits(
                pdu, ch, crc_init_hex=crc_hex,
                access_address_hex=aa.to_bytes(4, "little").hex())
            return G.gfsk_modulate_float(phy, 80)

        def data_pdu(n):
            payload = rng.integers(0, 256, n, dtype=np.uint8)
            return B.bytes_to_bits(
                np.concatenate([[0x01, n], payload]).astype(np.uint8))

        cr1 = B.bytes_to_bits(connect_req_pdu_bytes(AA_1, CRC_1, 9, 16))
        cr2 = B.bytes_to_bits(connect_req_pdu_bytes(AA_2, CRC_2, 7, 16))
        d1, d2 = data_pdu(10), data_pdu(14)

        block_wb = 8192 * 20
        n = 2 * block_wb + 60000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        for ch, sig, pos in (
            (37, G.gfsk_modulate_float(G.assemble_phy_bits(cr1, 37), 80), 30000),
            (38, G.gfsk_modulate_float(G.assemble_phy_bits(cr2, 38), 80), 70000),
            (9, data80(d1, 9, CRC_1, AA_1), block_wb + 40000),
            (7, data80(d2, 7, CRC_2, AA_2), block_wb + 90000),
        ):
            si, sq = synthesize_wideband({ch: sig}, n, {ch: pos})
            wi += si
            wq += sq

        sn = WidebandSniffer(WidebandConfig(follow_connections=True,
                                            max_follow=4))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        by_ch = {p.channel: p for p in pkts}
        assert {37, 38, 9, 7} <= set(by_ch)
        np.testing.assert_array_equal(by_ch[9].pdu_bytes, B.bits_to_bytes(d1))
        np.testing.assert_array_equal(by_ch[7].pdu_bytes, B.bits_to_bytes(d2))
        assert set(sn.multi_follower.connections) == {AA_1, AA_2}
        # per-channel keys: each connection owns exactly its own channel
        rows = np.asarray(sn.aa_rows)
        np.testing.assert_array_equal(
            rows[channel_to_bin(9)],
            B.hex_to_bits(AA_1.to_bytes(4, "little").hex()))
        np.testing.assert_array_equal(
            rows[channel_to_bin(7)],
            B.hex_to_bits(AA_2.to_bytes(4, "little").hex()))


class TestWidebandMapUpdate:
    def test_map_update_rekeys_live_follow(self, rng):
        """E2E (XLA path; hardware twin = soak_fused_tpu --map-updates):
        CONNECT_REQ (hop 9) -> sync on ch9 -> LL_CHANNEL_MAP_REQ masks
        ch18 at instant 1 -> the 22528 us hop applies the map, so the
        dwell-2 packet on the CSA#1 remap (ch19) decodes with the
        connection's keys. The reference ignores the opcode and would
        sit deaf on ch18."""
        from btle_tpu.wideband.channelizer import (channel_to_bin,
                                                   compose_wideband)

        aa_hex = AA_1.to_bytes(4, "little").hex()
        placements = []
        expected = []

        def place(ch, t_us, pdu, crc_hex="555555", aa="d6be898e"):
            phy = G.assemble_phy_bits(B.bytes_to_bits(pdu), ch,
                                      crc_init_hex=crc_hex,
                                      access_address_hex=aa)
            si, sq = G.gfsk_modulate_float(phy, 80)
            placements.append((ch, t_us * 80, si.astype(np.float32),
                               sq.astype(np.float32)))
            expected.append((ch, bytes(pdu)))

        place(37, 200, connect_req_pdu_bytes(AA_1, CRC_1, 9, 16))
        d1 = np.concatenate([[0x01, 6],
                             rng.integers(0, 256, 6)]).astype(np.uint8)
        place(9, 8300, d1, CRC_1, aa_hex)
        # LL_CHANNEL_MAP_REQ: opcode 01, chm on-air FF FF FB FF 1F
        # (masks ch 18), instant 1
        ctrl = np.array([0x03, 8, 0x01, 0xFF, 0xFF, 0xFB, 0xFF, 0x1F,
                         0x01, 0x00], np.uint8)
        place(9, 15000, ctrl, CRC_1, aa_hex)
        d2 = np.concatenate([[0x01, 7],
                             rng.integers(0, 256, 7)]).astype(np.uint8)
        place(19, 24700, d2, CRC_1, aa_hex)   # used[18 % 36] = 19

        n_wb = 29000 * 80
        wi, wq = compose_wideband(placements, n_wb)
        wi += rng.normal(0, 0.01, n_wb).astype(np.float32)
        wq += rng.normal(0, 0.01, n_wb).astype(np.float32)

        sn = WidebandSniffer(WidebandConfig(follow_connections=True,
                                            max_follow=4))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        got = {(p.channel, bytes(p.pdu_bytes)) for p in pkts}
        assert all(e in got for e in expected), (expected, got)
        t = sn.multi_follower.connections[AA_1].tracker
        assert 18 not in t.used and t.channel == 19
        assert any(e.event == "chm_update"
                   for e in sn.multi_follower.events)
        # post-hop ownership: the remapped channel carries AA_1's key
        rows = np.asarray(sn.aa_rows)
        np.testing.assert_array_equal(
            rows[channel_to_bin(19)], B.hex_to_bits(aa_hex))


@pytest.mark.slow
class TestDenseMultiFollow:
    """13 concurrent connections through the wideband pipeline in one
    scene: registration burst, per-connection sync, a simultaneous
    13-channel hop re-key, a deliberate same-hop channel collision with
    recovery, and a staleness drop that frees its channel for another
    connection's hop — per-connection byte-exact packet recovery
    asserted throughout. Scales the 2-connection E2E to the density the
    37-connection claim implies (the reference's single radio follows
    exactly one connection, btle_rx.c:2403-2536)."""

    # interval 16 = 20000 us: synced conns hop when now-sync > 13000
    # (GUARD_US 7000); the first block tick past that is 22528 us.
    HOPS = [5, 6, 7, 8, 10, 11, 12, 13, 14, 15]   # dwell2 = 2*hop % 37
    HOP_AB = 9                                     # the collision pair
    HOP_L = 16                                     # the stale connection

    def _aa(self, j):
        return 0x53A00000 + j * 0x01101

    def _crc(self, j):
        return f"{0x111111 + j * 0x030201:06x}"

    def test_thirteen_connections_hop_collide_drop(self, rng):
        from btle_tpu.wideband.channelizer import compose_wideband

        # connection table: 0..9 regular, 10 = A (wins ch9), 11 = B
        # (loses ch9 until A hops away), 12 = L (interval 8, never sends
        # data -> stale-drops at tick 22528: 22528-2000 > 2*10000)
        hops = self.HOPS + [self.HOP_AB, self.HOP_AB, self.HOP_L]
        intervals = [16] * 12 + [8]
        # A's CONNECT_REQ must decode before B's in the same block:
        # bin order is ch39(19) < ch37(20) < ch38(32)
        cr_ch = [[37, 38, 39][j % 3] for j in range(10)] + [39, 38, 37]
        cr_t = [200 + (j // 3) * 450 for j in range(13)]  # us, block 0

        placements = []   # (channel, start_wb, i, q)
        expected = []     # (channel, pdu_bytes, access_addr)

        def place(ch, t_us, pdu_bits, crc_hex="555555", aa_hex="d6be898e"):
            phy = G.assemble_phy_bits(pdu_bits, ch, crc_init_hex=crc_hex,
                                      access_address_hex=aa_hex)
            si, sq = G.gfsk_modulate_float(phy, 80)
            placements.append((ch, t_us * 80, si.astype(np.float32),
                               sq.astype(np.float32)))

        for j in range(13):
            cr = connect_req_pdu_bytes(self._aa(j), self._crc(j), hops[j],
                                       intervals[j])
            place(cr_ch[j], cr_t[j], B.bytes_to_bits(cr))
            expected.append((cr_ch[j], bytes(cr), 0x8E89BED6))

        def data_pdu(j, phase):
            payload = rng.integers(0, 256, 8 + j % 5, dtype=np.uint8)
            pdu = np.concatenate(
                [[0x01, len(payload)], payload]).astype(np.uint8)
            return pdu

        def place_data(j, ch, t_us):
            pdu = data_pdu(j, t_us)
            aa_hex = self._aa(j).to_bytes(4, "little").hex()
            place(ch, t_us, B.bytes_to_bits(pdu), crc_hex=self._crc(j),
                  aa_hex=aa_hex)
            expected.append((ch, bytes(pdu), self._aa(j)))

        # sync packets, block 4 (8192-10240 us): dwell1 = hop % 37;
        # A owns ch9; B and L send nothing yet
        for j in range(11):
            place_data(j, hops[j] % 37, 8300 + j * 50)
        # tick 22528: every synced conn hops to 2*hop % 37; L stale-drops
        # (freeing ch16 for conn 3's hop 8 -> 16); ch9's owner A leaves,
        # so the rebuild hands ch9 to still-waiting B
        for j in range(11):
            place_data(j, (2 * hops[j]) % 37, 24700 + j * 50)
        place_data(11, self.HOP_AB, 24000)        # B finally syncs on ch9

        n_wb = 29000 * 80
        wi, wq = compose_wideband(placements, n_wb)
        wi += rng.normal(0, 0.01, n_wb).astype(np.float32)
        wq += rng.normal(0, 0.01, n_wb).astype(np.float32)

        sn = WidebandSniffer(WidebandConfig(follow_connections=True,
                                            max_follow=16,
                                            drop_after_intervals=2))
        pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
        got = {(p.channel, bytes(p.pdu_bytes)): p for p in pkts}

        missing = [(ch, pdu.hex()) for ch, pdu, _ in expected
                   if (ch, pdu) not in got]
        assert not missing, f"{len(missing)} packets lost: {missing}"
        for ch, pdu, aa in expected:
            assert got[(ch, pdu)].access_addr == aa, (
                f"ch{ch} decoded under AA {got[(ch, pdu)].access_addr:08x}, "
                f"expected {aa:08x}")

        f = sn.multi_follower
        # L dropped; everyone else still tracked
        assert set(f.connections) == {self._aa(j) for j in range(12)}
        drops = [e for e in f.events if e.event == "track_drop"]
        assert [e.access_addr for e in drops] == [self._aa(12)]
        # the collision loser now owns ch9; the winner moved to 18
        assert f._owners[channel_to_bin(9)] == self._aa(11)
        assert f._owners[channel_to_bin(18)] == self._aa(10)
        # conn 3 (hop 8) took over the dropped connection's channel 16
        assert f._owners[channel_to_bin(16)] == self._aa(3)


class TestShardedMultiFollow:
    def test_two_connections_across_steps(self, rng):
        """Sharded path: CONNECT_REQs in step 1 re-key each connection's
        own first hop channel for step 2 (super-block granularity)."""
        from btle_tpu.dist import ShardedWidebandScan, make_mesh

        mesh = make_mesh(1, 4)
        block_wb = 80000
        scan = ShardedWidebandScan(mesh, block_wb=block_wb)
        scan.enable_connection_following(max_follow=4)

        n = 4 * block_wb
        cr1 = B.bytes_to_bits(connect_req_pdu_bytes(AA_1, CRC_1, 9, 64))
        cr2 = B.bytes_to_bits(connect_req_pdu_bytes(AA_2, CRC_2, 7, 64))
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        for ch, bits, pos in ((37, cr1, 30000), (38, cr2, 90000)):
            si, sq = synthesize_wideband(
                {ch: G.gfsk_modulate_float(G.assemble_phy_bits(bits, ch), 80)},
                n, {ch: pos})
            wi += si
            wq += sq
        pkts1 = scan.gather_packets(scan(wi, wq))
        assert sum(p.crc_ok for p in pkts1) == 2
        assert set(scan.multi_follower.connections) == {AA_1, AA_2}

        def data_pdu(k):
            payload = rng.integers(0, 256, k, dtype=np.uint8)
            return B.bytes_to_bits(
                np.concatenate([[0x01, k], payload]).astype(np.uint8))

        d1, d2 = data_pdu(9), data_pdu(13)
        wi2 = np.zeros(n, np.float32)
        wq2 = np.zeros(n, np.float32)
        for ch, pdu, crc_hex, aa, pos in (
            (9, d1, CRC_1, AA_1, 60000),      # AA_1's first hop channel
            (7, d2, CRC_2, AA_2, 140000),     # AA_2's first hop channel
        ):
            phy = G.assemble_phy_bits(pdu, ch, crc_init_hex=crc_hex,
                                      access_address_hex=aa.to_bytes(4, "little").hex())
            si, sq = synthesize_wideband({ch: G.gfsk_modulate_float(phy, 80)},
                                         n, {ch: pos})
            wi2 += si
            wq2 += sq
        pkts2 = [p for p in scan.gather_packets(scan(wi2, wq2)) if p.crc_ok]
        by_ch = {p.channel: p for p in pkts2}
        assert set(by_ch) == {9, 7}
        np.testing.assert_array_equal(by_ch[9].pdu_bytes, B.bits_to_bytes(d1))
        np.testing.assert_array_equal(by_ch[7].pdu_bytes, B.bits_to_bytes(d2))


class TestShardedDenseMultiFollow:
    def test_six_connections_rekey_across_superblocks(self, rng):
        """Sharded path, three super-blocks: 6 CONNECT_REQs register in
        step 1, all 6 connections sync on their first hop channels in
        step 2, the interval clock hops every connection between steps
        (interval 8: 10000-7000 us guard elapses inside step 2), and
        step 3 decodes every connection on its SECOND hop channel —
        proving the super-block re-key granularity end-to-end at 3x the
        previous density."""
        from btle_tpu.dist import ShardedWidebandScan, make_mesh
        from btle_tpu.wideband.channelizer import compose_wideband

        hops = [5, 6, 7, 11, 13, 15]
        aas = [0x6B000001 + 0x01103 * j for j in range(6)]
        crcs = [f"{0x212121 + j * 0x030201:06x}" for j in range(6)]

        mesh = make_mesh(1, 4)
        block_wb = 80000                       # 1 ms of 80 Msps air
        n = 4 * block_wb                       # one super-block = 4 ms
        scan = ShardedWidebandScan(mesh, block_wb=block_wb)
        scan.enable_connection_following(max_follow=8)

        def compose(placements):
            wi, wq = compose_wideband(placements, n)
            wi += rng.normal(0, 0.01, n).astype(np.float32)
            wq += rng.normal(0, 0.01, n).astype(np.float32)
            return wi, wq

        def burst(pdu_bits, ch, crc_hex="555555", aa_hex="d6be898e"):
            phy = G.assemble_phy_bits(pdu_bits, ch, crc_init_hex=crc_hex,
                                      access_address_hex=aa_hex)
            si, sq = G.gfsk_modulate_float(phy, 80)
            return si.astype(np.float32), sq.astype(np.float32)

        # step 1: CONNECT_REQs (interval 8 -> hop guard 3000 us)
        pl = []
        for j in range(6):
            cr = connect_req_pdu_bytes(aas[j], crcs[j], hops[j], 8)
            ch = [37, 38, 39][j % 3]
            pl.append((ch, (200 + (j // 3) * 450) * 80,
                       *burst(B.bytes_to_bits(cr), ch)))
        pkts1 = [p for p in scan.gather_packets(scan(*compose(pl)))
                 if p.crc_ok]
        assert len(pkts1) == 6
        assert set(scan.multi_follower.connections) == set(aas)

        def data(j):
            payload = rng.integers(0, 256, 6 + j, dtype=np.uint8)
            return np.concatenate(
                [[0x01, len(payload)], payload]).astype(np.uint8)

        # step 2: sync packets on dwell1 = hop % 37, early in the step
        # (abs 4200..4300 us; different channels may overlap in time) so
        # now_us=8000 at the step's tick clears the 3000 us hop guard
        # for every connection
        d1 = [data(j) for j in range(6)]
        pl = [(hops[j] % 37, (200 + j * 20) * 80,
               *burst(B.bytes_to_bits(d1[j]), hops[j] % 37, crcs[j],
                      aas[j].to_bytes(4, "little").hex()))
              for j in range(6)]
        pkts2 = [p for p in scan.gather_packets(scan(*compose(pl)))
                 if p.crc_ok]
        by_ch = {p.channel: p for p in pkts2}
        for j in range(6):
            np.testing.assert_array_equal(by_ch[hops[j] % 37].pdu_bytes,
                                          d1[j])
            assert by_ch[hops[j] % 37].access_addr == aas[j]

        # the tick hopped every tracker; step 3 decodes on dwell2
        for j in range(6):
            assert scan.multi_follower.connections[aas[j]].tracker.channel \
                == (2 * hops[j]) % 37
        d2 = [data(j + 6) for j in range(6)]
        pl = [((2 * hops[j]) % 37, (300 + j * 100) * 80,
               *burst(B.bytes_to_bits(d2[j]), (2 * hops[j]) % 37, crcs[j],
                      aas[j].to_bytes(4, "little").hex()))
              for j in range(6)]
        pkts3 = [p for p in scan.gather_packets(scan(*compose(pl)))
                 if p.crc_ok]
        by_ch = {p.channel: p for p in pkts3}
        for j in range(6):
            ch = (2 * hops[j]) % 37
            np.testing.assert_array_equal(by_ch[ch].pdu_bytes, d2[j])
            assert by_ch[ch].access_addr == aas[j]


def test_packet_access_addr_records_channel_key(rng):
    """WidebandPacket.access_addr carries the AA that keyed the channel
    at decode time — the value a pcap PHDR must carry (ADV AA on the
    advertising channels, the owning connection's AA on its channel)."""
    def data80(pdu, ch, crc_hex, aa):
        phy = G.assemble_phy_bits(
            pdu, ch, crc_init_hex=crc_hex,
            access_address_hex=aa.to_bytes(4, "little").hex())
        return G.gfsk_modulate_float(phy, 80)

    cr1 = B.bytes_to_bits(connect_req_pdu_bytes(AA_1, CRC_1, 9, 16))
    payload = rng.integers(0, 256, 8, dtype=np.uint8)
    d1 = B.bytes_to_bits(np.concatenate([[0x01, 8], payload]).astype(np.uint8))

    block_wb = 8192 * 20
    n = 2 * block_wb + 40000
    wi = np.zeros(n, np.float32)
    wq = np.zeros(n, np.float32)
    for ch, sig, pos in (
        (37, G.gfsk_modulate_float(G.assemble_phy_bits(cr1, 37), 80), 30000),
        (9, data80(d1, 9, CRC_1, AA_1), block_wb + 50000),
    ):
        si, sq = synthesize_wideband({ch: sig}, n, {ch: pos})
        wi += si
        wq += sq
    sn = WidebandSniffer(WidebandConfig(follow_connections=True, max_follow=4))
    pkts = [p for p in sn.run(wi, wq) if p.crc_ok]
    by_ch = {p.channel: p for p in pkts}
    assert by_ch[37].access_addr == 0x8E89BED6
    assert by_ch[9].access_addr == AA_1
