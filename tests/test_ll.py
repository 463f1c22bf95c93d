"""Link-layer codec + hop FSM tests."""

import numpy as np
import pytest

from btle_tpu.ll import (
    AdvPduType,
    ConnectionInfo,
    HopTracker,
    LlCtrlOpcode,
    LlPduType,
    extract_adv_a,
    parse_adv_header,
    parse_adv_payload,
    parse_ll_header,
    parse_ll_payload,
)


class TestAdvParse:
    def test_header(self):
        h = parse_adv_header([0x42, 0x25])
        assert h.pdu_type == AdvPduType.ADV_NONCONN_IND
        assert h.tx_add == 1 and h.rx_add == 0
        assert h.payload_len == 37

    def test_adv_ind_payload(self):
        payload = bytes([0x06, 0x05, 0x04, 0x03, 0x02, 0x01]) + b"\x02\x01\x06"
        p = parse_adv_payload(payload, AdvPduType.ADV_IND)
        assert p.adv_a == bytes([0x01, 0x02, 0x03, 0x04, 0x05, 0x06])
        assert p.data == b"\x02\x01\x06"
        assert extract_adv_a(p, AdvPduType.ADV_IND) == p.adv_a

    def test_connect_req_payload(self):
        # Build the CONNECT_REQ payload from the reference's canonical
        # example (btle_tx.c:2675 usage comment): InitA-001830EA965F
        # AdvA-90D7EBB19299 AA-60850A1B CRCInit-A77B22 WinSize-02
        # WinOffset-000F Interval-0050 Latency-0000 Timeout-07D0
        # ChM-1FFFFFFFFF Hop-9 SCA-5
        init_a = bytes.fromhex("001830EA965F")[::-1]
        adv_a = bytes.fromhex("90D7EBB19299")[::-1]
        aa = bytes.fromhex("60850A1B")[::-1]
        crcinit = bytes.fromhex("A77B22")
        win_size = bytes([0x02])
        win_offset = (0x000F).to_bytes(2, "little")
        interval = (0x0050).to_bytes(2, "little")
        latency = (0x0000).to_bytes(2, "little")
        timeout = (0x07D0).to_bytes(2, "little")
        chm = bytes.fromhex("1FFFFFFFFF")[::-1]
        hop_sca = bytes([9 | (5 << 5)])
        payload = init_a + adv_a + aa + crcinit + win_size + win_offset + interval + latency + timeout + chm + hop_sca
        assert len(payload) == 34
        p = parse_adv_payload(payload, AdvPduType.CONNECT_REQ)
        assert p.init_a == bytes.fromhex("001830EA965F")
        assert p.adv_a == bytes.fromhex("90D7EBB19299")
        assert p.aa == 0x60850A1B
        assert p.crc_init == 0xA77B22
        assert p.win_size == 2
        assert p.win_offset == 0x000F
        assert p.interval == 0x0050
        assert p.latency == 0
        assert p.timeout == 0x07D0
        assert p.chm == bytes.fromhex("1FFFFFFFFF")
        assert p.hop == 9 and p.sca == 5

    def test_scan_req_filter_address(self):
        payload = bytes(range(6)) + bytes(range(6, 12))
        p = parse_adv_payload(payload, AdvPduType.SCAN_REQ)
        assert extract_adv_a(p, AdvPduType.SCAN_REQ) == bytes(range(6))[::-1]

    def test_too_short_rejected(self):
        with pytest.raises(ValueError):
            parse_adv_payload(b"\x01\x02", AdvPduType.ADV_IND)


class TestLlParse:
    def test_header(self):
        h = parse_ll_header([0x01 | 0x04 | 0x10, 0x1B])
        assert h.llid == LlPduType.LL_DATA1
        assert h.nesn == 1 and h.sn == 0 and h.md == 1
        assert h.payload_len == 27

    def test_data_payload(self):
        p = parse_ll_payload(b"\x01\x02\x03", LlPduType.LL_DATA2)
        assert p.data == b"\x01\x02\x03"
        assert p.ctrl is None

    def test_connection_update(self):
        body = bytes([0x00, 0x02]) + (15).to_bytes(2, "little") + (80).to_bytes(2, "little") \
            + (0).to_bytes(2, "little") + (2000).to_bytes(2, "little") + (7).to_bytes(2, "little")
        p = parse_ll_payload(body, LlPduType.LL_CTRL)
        assert p.ctrl.opcode == LlCtrlOpcode.LL_CONNECTION_UPDATE_REQ
        assert p.ctrl.fields["interval"] == 80
        assert p.ctrl.fields["instant"] == 7

    def test_channel_map_req(self):
        body = bytes([0x01]) + bytes.fromhex("1FFFFFFFFF")[::-1] + (12).to_bytes(2, "little")
        p = parse_ll_payload(body, LlPduType.LL_CTRL)
        assert p.ctrl.fields["chm"] == bytes.fromhex("1FFFFFFFFF")
        assert p.ctrl.fields["instant"] == 12

    def test_version_ind(self):
        body = bytes([0x0C, 7]) + (0x0059).to_bytes(2, "little") + (0x1234).to_bytes(2, "little")
        p = parse_ll_payload(body, LlPduType.LL_CTRL)
        assert p.ctrl.fields == {"vers_nr": 7, "comp_id": 0x59, "sub_vers_nr": 0x1234}

    def test_enc_req(self):
        body = bytes([0x03]) + bytes(range(8)) + bytes([8, 9]) + bytes(range(10, 18)) + bytes(range(18, 22))
        p = parse_ll_payload(body, LlPduType.LL_CTRL)
        assert p.ctrl.fields["rand"] == bytes(range(8))[::-1]
        assert p.ctrl.fields["ediv"] == bytes([9, 8])

    def test_wrong_length_rejected(self):
        with pytest.raises(ValueError):
            parse_ll_payload(bytes([0x02]), LlPduType.LL_CTRL)  # TERMINATE needs 2

    def test_reserved_opcode(self):
        p = parse_ll_payload(bytes([0x1F, 1, 2]), LlPduType.LL_CTRL)
        assert p.ctrl.opcode == 0x1F
        assert p.ctrl.fields["raw"] == bytes([1, 2])

    def test_empty_ctrl_rejected(self):
        with pytest.raises(ValueError):
            parse_ll_payload(b"", LlPduType.LL_CTRL)


class TestHopTracker:
    def conn(self, chm=bytes.fromhex("1FFFFFFFFF")):
        return ConnectionInfo(
            access_addr=0x60850A1B, crc_init=0xA77B22, hop=9,
            interval=0x50, chm=chm,
        )

    def test_partial_chm_followed_via_csa1(self):
        """Beyond-reference: a partial map engages CSA#1 remapping
        (Core 5.3 4.5.8.2) instead of the reference's track_drop."""
        # display [1F FF FF FD FF] = on-air b[1] bit1 clear = ch 9 unused
        t = HopTracker()
        t.on_connect_req(self.conn(chm=bytes.fromhex("1FFFFFFDFF")), 0)
        assert t.state == 1
        # unmapped (0+9)%37 = 9 is masked -> used[9 % 36]; used ascending
        # skips 9, so index 9 lands on channel 10
        assert t.hop_chan == 9 and t.channel == 10
        assert t.events[-1].event == "track_start"
        assert t.events[-1].channel == 10

    def test_partial_chm_unmasked_channels_unremapped(self):
        # ch 0 masked only: (0+9)%37 = 9 is still used -> no remap
        t = HopTracker()
        t.on_connect_req(self.conn(chm=bytes.fromhex("1FFFFFFFFE")), 0)
        assert t.state == 1 and t.channel == 9

    def test_require_full_map_restores_reference_gate(self):
        t = HopTracker(require_full_map=True)
        t.on_connect_req(self.conn(chm=bytes.fromhex("1FFFFFFFFE")), 0)
        assert t.state == 0
        assert t.events[-1].event == "track_drop"

    def test_single_channel_map_dropped(self):
        # fewer than 2 used channels cannot hop (spec validity floor)
        t = HopTracker()
        t.on_connect_req(self.conn(chm=bytes.fromhex("0000000001")), 0)
        assert t.state == 0
        assert t.events[-1].event == "track_drop"

    def _hop_once(self, t, k=1):
        t.state = 2
        t.time_mark_us = 0
        t.on_tick(t.target_us + 1 + k)

    def test_channel_map_update_applied_at_instant(self):
        """LL_CHANNEL_MAP_REQ holds until its instant (event = dwell
        count), then re-keys the CSA#1 map — the reference parses this
        opcode and ignores it (follow breaks on a real map change)."""
        t = HopTracker()
        t.on_connect_req(self.conn(), 0)       # full map, hop 9, ch 9
        # mask channel 27 ((9+9+9)%37 = the 3rd dwell's channel):
        # display [1F F7 FF FF FF] = on-air byte3 bit3 clear = ch 27
        t.on_ll_ctrl(0x01, {"chm": bytes.fromhex("1FF7FFFFFF"),
                            "instant": 2}, 1000)
        assert t.pending_chm is not None       # not yet (event_count 0)
        self._hop_once(t, 1)                   # event 1 -> ch 18
        assert t.pending_chm is not None and t.channel == 18
        self._hop_once(t, 2)                   # event 2: map applies
        assert t.pending_chm is None
        assert 27 not in t.used and len(t.used) == 36
        # unmapped 27 is now masked -> used[27 % 36] (ascending skips 27)
        assert t.hop_chan == 27 and t.channel == 28
        assert any(e.event == "chm_update" for e in t.events)

    def test_connection_update_changes_interval_at_instant(self):
        t = HopTracker()
        t.on_connect_req(self.conn(), 0)
        assert t.interval_us == 0x50 * 1250
        t.on_ll_ctrl(0x00, {"interval": 8, "instant": 0}, 500)
        assert t.pending_update is None        # instant 0: immediate
        assert t.interval_us == 10000
        assert t.target_us == 10000 - 7000
        assert t.conn.interval == 8
        assert t.events[-1].event == "conn_update"

    def test_instant_comparison_wraps_mod_2_16(self):
        """connEventCount is 16-bit: an instant numerically below the
        current count but ahead across the wrap must HOLD, and apply
        once the counter wraps past it."""
        t = HopTracker()
        t.on_connect_req(self.conn(), 0)
        t.event_count = 0xFFFE                 # long-lived follow
        t.on_ll_ctrl(0x01, {"chm": bytes.fromhex("1FFFFFFDFF"),
                            "instant": 2}, 0)  # 6 events ahead, wrapped
        assert t.pending_chm is not None       # plain >= would fire now
        for k in range(6):
            self._hop_once(t, k)
        assert t.event_count == 4 and t.pending_chm is None
        assert 9 not in t.used

    def test_invalid_ctrl_updates_ignored(self):
        t = HopTracker()
        t.on_connect_req(self.conn(), 0)
        t.on_ll_ctrl(0x01, {"chm": bytes.fromhex("0000000001"),
                            "instant": 0}, 0)  # 1-channel map: can't hop
        assert t.pending_chm is None and len(t.used) == 37
        t.on_ll_ctrl(0x00, {"interval": 0, "instant": 0}, 0)
        assert t.interval_us == 0x50 * 1250
        t.on_ll_ctrl(0x0C, {"vers_nr": 7}, 0)  # unrelated opcode
        assert t.pending_chm is None and t.pending_update is None

    def test_csa1_walks_only_used_channels(self):
        from btle_tpu.spec.channels import chm_used_channels

        chm = bytes.fromhex("1F00FF00FF")     # channels 0-7, 16-23, 32-36
        used = chm_used_channels(chm)
        assert used == tuple(range(8)) + tuple(range(16, 24)) + \
            tuple(range(32, 37))
        t = HopTracker()
        t.on_connect_req(self.conn(chm=chm), 0)
        seen = {t.channel}
        for k in range(1, 80):
            t.state = 2
            t.time_mark_us = 0
            t.on_tick(t.target_us + 1 + k)    # force a timed hop
            assert t.channel in used
            seen.add(t.channel)
        assert seen == set(used)              # hop=9 covers the whole map

    def test_track_sequence(self):
        t = HopTracker()
        t.on_connect_req(self.conn(), 0)
        assert t.state == 1
        assert t.channel == 9              # (0+9)%37
        assert t.access_addr == 0x60850A1B
        # crc_init_reorder(A77B22): swap -> 227BA7, bit-reverse
        from btle_tpu.spec.crc24 import crc_init_reorder
        assert t.crc_init_internal == crc_init_reorder(0xA77B22)

        interval_us = 0x50 * 1250
        t.on_crc_ok_packet(1000)
        assert t.state == 2
        # not yet time
        t.on_tick(1000 + interval_us - 8000)
        assert t.state == 2 and t.channel == 9
        # time up -> hop to (9+9)%37=18
        t.on_tick(1000 + interval_us - 6000)
        assert t.state == 3 and t.channel == 18
        # sync packet on new channel -> back to state 2
        t.on_crc_ok_packet(1000 + interval_us)
        assert t.state == 2
        # miss the next dwell: skip logic advances the channel anyway
        t.on_tick(1000 + 2 * interval_us - 6000)
        assert t.channel == 27
        t.on_tick(1000 + 3 * interval_us - 5000)
        assert t.state == 3 and t.channel == 36

    def test_hop_wraps_mod_37(self):
        t = HopTracker()
        t.hop_chan = 30
        t.on_connect_req(self.conn(), 0)
        assert t.channel == (30 + 9) % 37
