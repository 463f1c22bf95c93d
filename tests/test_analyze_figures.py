"""Figure-level analyze parity: timeline / intervals / vendors views as
matplotlib Figures consumable by the CLI (--plot) and the TUI, mirroring
the reference's figure-returning analyze API (analyze.py:89-140)."""

import subprocess
import sys

import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from btle_tpu.cli.analyze import (intervals_figure, save_figures,
                                  timeline_figure, vendors_figure)
from btle_tpu.stream.pcap import PcapWriter


def _adv_packet(adv_a_hex: str, name: str = "") -> bytes:
    payload = bytes.fromhex(adv_a_hex)[::-1]
    if name:
        nb = name.encode()
        payload += bytes([len(nb) + 1, 0x09]) + nb
    return bytes([0x00, len(payload)]) + payload


@pytest.fixture
def pcap(tmp_path):
    """Three devices, staggered timestamps, two with repeat packets."""
    p = tmp_path / "cap.pcap"
    with PcapWriter(str(p)) as w:
        t = 1000.0
        for k in range(6):
            w.write_packet(_adv_packet("0a0b0c0d0e0f", "Lamp"), 37,
                           0x8E89BED6, rssi_dbm=-50, ts=t + 0.1 * k)
            w.write_packet(_adv_packet("112233445566"), 38,
                           0x8E89BED6, rssi_dbm=-70, ts=t + 0.05 + 0.1 * k)
        w.write_packet(_adv_packet("77445566aabb", "One"), 39,
                       0x8E89BED6, rssi_dbm=-60, ts=t + 0.3)
    return p


class TestFigures:
    def test_timeline_rows_are_devices(self, pcap):
        fig = timeline_figure(str(pcap))
        assert fig is not None
        ax = fig.axes[0]
        labels = [t.get_text() for t in ax.get_yticklabels()]
        assert len(labels) == 3
        assert "0a:0b:0c:0d:0e:0f" in labels
        mpl.pyplot.close(fig)

    def test_timeline_top_n_truncates(self, pcap):
        fig = timeline_figure(str(pcap), top_n=2)
        assert len(fig.axes[0].get_yticklabels()) == 2
        mpl.pyplot.close(fig)

    def test_intervals_histogram_and_median(self, pcap):
        fig = intervals_figure(str(pcap))
        ax = fig.axes[0]
        assert ax.patches                      # histogram bars exist
        texts = " ".join(t.get_text() for t in ax.texts)
        assert "median 100.0 ms" in texts      # 0.1 s advertising period
        mpl.pyplot.close(fig)

    def test_intervals_single_device_filter(self, pcap):
        fig = intervals_figure(str(pcap), adv_a="0a:0b:0c:0d:0e:0f")
        assert "0a:0b:0c:0d:0e:0f" in fig.axes[0].get_title()
        mpl.pyplot.close(fig)

    def test_vendors_bars(self, pcap):
        fig = vendors_figure(str(pcap))
        ax = fig.axes[0]
        assert ax.patches                      # one bar per vendor bucket
        assert "3 devices" in ax.get_title()
        mpl.pyplot.close(fig)

    def test_save_figures_writes_three(self, pcap, tmp_path):
        written = save_figures(str(pcap), str(tmp_path / "out.png"))
        assert [w.rsplit("-", 1)[-1] for w in written] == [
            "timeline.png", "intervals.png", "vendors.png"]
        for w in written:
            assert (tmp_path / w.split("/")[-1]).stat().st_size > 1000


class TestCliPlotWiring:
    def test_analyze_plot_writes_all_figures(self, pcap, tmp_path):
        out = tmp_path / "plots.png"
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu.cli", "analyze", str(pcap),
             "--plot", str(out)],
            capture_output=True, text=True, timeout=300,
            env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"},
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        assert out.exists()
        for suffix in ("timeline", "intervals", "vendors"):
            assert (tmp_path / f"plots-{suffix}.png").exists(), suffix


class TestTuiPlotKey:
    def test_p_key_saves_figures(self, pcap, tmp_path):
        from btle_tpu.cli.tui import AnalyzeScreen, BtleTui

        app = BtleTui(iter([]), capture_dir=str(tmp_path))
        pcap.rename(tmp_path / "cap.pcap")
        app.push(AnalyzeScreen(app))
        app.key("p")
        text = "\n".join(app.render(100, 30))
        assert "wrote" in text
        assert (tmp_path / "cap-timeline.png").exists()
