"""Multi-screen TUI driven headless by a fake event stream: scan table,
device detail, capture-to-pcap, analyze — the four screens of the
reference Textual app (btle_cli/tui/screens/), no terminal needed."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.cli.events import PktEvent
from btle_tpu.cli.tui import (
    AnalyzeScreen,
    BtleTui,
    CaptureScreen,
    DeviceDetailScreen,
    ScanScreen,
    run_headless,
)


def _adv(ts, adv_a="aa:bb:cc:dd:ee:ff", ch=37, rssi=-50, name=None,
         pdu_type=0):
    # on-air AdvA byte order is least-significant first (the pcap loader
    # reverses it back to display order)
    adva_hex = bytes.fromhex(adv_a.replace(":", ""))[::-1].hex()
    payload = adva_hex
    if name:
        nb = name.encode()
        payload += f"{len(nb) + 1:02x}09" + nb.hex()
    return PktEvent(
        v=1, t="pkt", ts=ts, pkt=0, ch=ch, aa="8e89bed6", crc_ok=True,
        kind="adv", pdu_type=pdu_type, pdu_name="ADV_IND", tx_add=0,
        rx_add=0, plen=len(payload) // 2, adv_a=adv_a,
        payload_hex=payload, rssi_est=rssi,
    )


def _stream(n=6):
    evts = []
    for k in range(n):
        evts.append(_adv(1000.0 + 0.1 * k, name="Lamp"))
        evts.append(_adv(1000.05 + 0.1 * k, adv_a="11:22:33:44:55:66",
                         ch=38, rssi=-70))
    return evts


class TestScanScreen:
    def test_table_and_sort_and_selection(self):
        app = BtleTui(_stream())
        app.pump(999)
        lines = app.render(100, 24)
        text = "\n".join(lines)
        assert "aa:bb:cc:dd:ee:ff" in text
        assert "11:22:33:44:55:66" in text
        assert "Lamp" in text
        assert "scan" in lines[0]
        # selection moves
        assert isinstance(app.screen, ScanScreen)
        first = app.screen.selected().adv_a
        app.key("KEY_DOWN")
        assert app.screen.selected().adv_a != first
        # sort cycling changes the sort tag in the header line
        app.key("s")
        assert "last_seen" in app.render(100, 24)[1]

    def test_quit_closes(self):
        app = BtleTui(_stream())
        app.key("q")
        assert app.quit

    def test_esc_quits_from_root_but_pops_subscreens(self):
        app = BtleTui(_stream())
        app.pump(999)
        app.key("\n")
        assert isinstance(app.screen, DeviceDetailScreen)
        app.key("\x1b")                    # sub-screen: back, not quit
        assert isinstance(app.screen, ScanScreen)
        assert not app.quit
        app.key("\x1b")                    # root scan screen: exit
        assert app.quit


class TestAggregateMerge:
    def test_empty_name_ad_keeps_learned_name(self):
        """A zero-body Local Name AD (len=1, type=0x09) carries no
        information and must not wipe a previously-learned name."""
        from btle_tpu.cli.aggregate import parse_ad_structures

        named = parse_ad_structures("00" * 6 + "050954657374")  # "Test"
        assert named.local_name == "Test"
        empty = parse_ad_structures("00" * 6 + "0109")
        assert empty.local_name is None
        named.absorb(empty)
        assert named.local_name == "Test"


class TestDeviceDetail:
    def test_enter_opens_detail_with_fields(self):
        app = BtleTui(_stream())
        app.pump(999)
        app.key("\n")
        assert isinstance(app.screen, DeviceDetailScreen)
        text = "\n".join(app.render(100, 30))
        assert "name=Lamp" in text
        assert "intervals(ms)" in text
        assert "ADV_IND" in text          # history rows
        app.key("\x1b")
        assert isinstance(app.screen, ScanScreen)


class TestCaptureScreen:
    def test_capture_filtered_to_pcap(self, tmp_path):
        from btle_tpu.stream.pcap import read_pcap

        app = BtleTui(iter(_stream(4)), capture_dir=str(tmp_path))
        app.pump(2)                       # some pre-capture traffic
        app.key("c")                      # capture selected (top) device
        assert isinstance(app.screen, CaptureScreen)
        target = app.screen.filter_adva
        assert target in ("aa:bb:cc:dd:ee:ff", "11:22:33:44:55:66")
        app.pump(999)                     # rest of the stream
        text = "\n".join(app.render(100, 24))
        assert "capturing " + target in text
        app.key("x")                      # stop + close pcap
        assert isinstance(app.screen, ScanScreen)
        pcaps = list(tmp_path.glob("*.pcap"))
        assert len(pcaps) == 1
        recs = read_pcap(pcaps[0])
        assert len(recs) >= 3
        # only the filtered device's AdvA appears in the records
        # (on-air order: reversed display bytes)
        for r in recs:
            assert bytes(r.packet[2:8]) == bytes.fromhex(
                target.replace(":", ""))[::-1]

    def test_capture_all_unfiltered(self, tmp_path):
        from btle_tpu.stream.pcap import read_pcap

        evts = _stream(3)
        app = BtleTui(iter(evts), capture_dir=str(tmp_path))
        app.screen.cursor = 99            # nothing selected yet
        app.key("c")
        assert app.screen.filter_adva is None
        app.pump(999)
        app.key("q")                      # quit closes open captures
        recs = read_pcap(list(tmp_path.glob("*.pcap"))[0])
        assert len(recs) == len(evts)


class TestAnalyzeScreen:
    def test_summarize_captured_pcap(self, tmp_path):
        # first: produce a pcap via the capture screen
        app = BtleTui(iter(_stream(5)), capture_dir=str(tmp_path))
        app.screen.cursor = 99
        app.key("c")
        app.pump(999)
        app.key("x")
        # then: analyze it
        app.key("a")
        assert isinstance(app.screen, AnalyzeScreen)
        lines = app.render(100, 30)
        assert any(".pcap" in ln for ln in lines)
        app.key("\n")                     # summarize selection
        text = "\n".join(app.render(100, 30))
        assert "devices" in text
        assert "aa:bb:cc:dd:ee:ff" in text
        app.key("\x1b")
        assert isinstance(app.screen, ScanScreen)


class TestHeadless:
    def test_run_headless_aggregates(self):
        agg = run_headless(_stream())
        assert len(agg.devices) == 2


class TestSpectrumScreen:
    """5th screen (beyond the reference's four): ASCII spectrum of the
    source IQ capture via utils/spectrum."""

    def _tone_file(self, tmp_path, f_hz=1e6, fs=8e6, n=65536):
        t = np.arange(n) / fs
        z = 80 * np.exp(1j * 2 * np.pi * f_hz * t)
        iq = np.empty(2 * n, np.int16)
        iq[0::2], iq[1::2] = z.real, z.imag
        path = tmp_path / "tone.bin"
        iq.tofile(path)
        return str(path)

    def test_spectrum_screen_shows_tone(self, tmp_path):
        from btle_tpu.cli.tui import SpectrumScreen

        path = self._tone_file(tmp_path)
        app = BtleTui(_stream(), iq_path=path, iq_format="i16",
                      sample_rate_hz=8e6)
        app.pump(99)
        app.key("w")
        assert isinstance(app.screen, SpectrumScreen)
        text = "\n".join(app.render(100, 30))
        assert "8 Msps" in text and "kHz" in text
        # the +1 MHz tone row must carry the longest bar and ~100% duty
        rows = [ln for ln in app.screen.lines(100, 28) if "kHz" in ln]
        best = max(rows, key=lambda ln: ln.count("#"))
        f_off = float(best.split("kHz")[0].strip().split()[-1])
        assert abs(f_off - 1000) < 200
        assert "100%" in best
        app.key("\x1b")
        assert isinstance(app.screen, ScanScreen)

    def test_spectrum_without_source_reports_gracefully(self):
        app = BtleTui(_stream())
        app.key("w")
        text = "\n".join(app.render(100, 30))
        assert "no IQ source" in text
