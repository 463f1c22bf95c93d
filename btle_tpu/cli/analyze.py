"""Capture analysis: summaries and optional plots from pcap files.

Equivalent of btle_cli.analyze (timeline / interval / vendor views).
Plot rendering requires matplotlib and is optional; the textual summary
always works.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field

from .pcap_loader import load as load_pcap
from .recon import aggregator_from_pcap, fingerprint


@dataclass
class CaptureAnalysis:
    path: str
    n_packets: int
    duration_s: float
    channels: dict[int, int]
    pdu_types: dict[str, int]
    vendors: dict[str, int]
    devices: int
    busiest_device: str | None
    mean_interval_ms: float | None
    fingerprints: dict[str, int] = field(default_factory=dict)

    def summary_lines(self) -> list[str]:
        lines = [
            f"capture: {self.path}",
            f"packets: {self.n_packets} over {self.duration_s:.2f}s "
            f"({self.n_packets / self.duration_s:.1f}/s)" if self.duration_s
            else f"packets: {self.n_packets}",
            f"devices: {self.devices}",
        ]
        if self.busiest_device:
            lines.append(f"busiest: {self.busiest_device}")
        if self.mean_interval_ms:
            lines.append(f"mean advert interval: {self.mean_interval_ms:.1f} ms")
        lines.append("channels: " + ", ".join(
            f"ch{c}:{n}" for c, n in sorted(self.channels.items())))
        lines.append("pdu types: " + ", ".join(
            f"{t}:{n}" for t, n in sorted(self.pdu_types.items(), key=lambda x: -x[1])))
        if self.vendors:
            lines.append("vendors: " + ", ".join(
                f"{v}:{n}" for v, n in sorted(self.vendors.items(), key=lambda x: -x[1])[:8]))
        if self.fingerprints:
            lines.append("fingerprints: " + ", ".join(
                f"{t}:{n}" for t, n in self.fingerprints.items()))
        return lines


def analyze_pcap(path) -> CaptureAnalysis:
    cap = load_pcap(path)
    agg = aggregator_from_pcap(cap)
    channels = collections.Counter(p.channel for p in cap.packets)
    pdu_types = collections.Counter(p.pdu_type_name for p in cap.packets)
    vendors: collections.Counter = collections.Counter()
    fps: collections.Counter = collections.Counter()
    intervals = []
    busiest = None
    best = 0
    for rec in agg.devices.values():
        if rec.vendor:
            vendors[rec.vendor] += 1
        tag = fingerprint(rec.parsed_ad)
        if tag:
            fps[tag] += 1
        intervals.extend(rec.advert_intervals_ms)
        if rec.pkt_count > best:
            best = rec.pkt_count
            busiest = f"{rec.adv_a} ({rec.name or rec.vendor or 'unknown'}, {rec.pkt_count} pkts)"
    return CaptureAnalysis(
        path=str(path),
        n_packets=len(cap.packets),
        duration_s=cap.duration_s,
        channels=dict(channels),
        pdu_types=dict(pdu_types),
        vendors=dict(vendors),
        devices=len(agg.devices),
        busiest_device=busiest,
        mean_interval_ms=(sum(intervals) / len(intervals)) if intervals else None,
        fingerprints=dict(fps),
    )


def plot_capture(path, out_png: str) -> bool:
    """Timeline + channel plots. Returns False when matplotlib is absent."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    cap = load_pcap(path)
    if not cap.packets:
        return False
    t0 = cap.packets[0].ts
    ts = [p.ts - t0 for p in cap.packets]
    chans = [p.channel for p in cap.packets]
    rssi = [p.rssi_dbm for p in cap.packets]
    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    axes[0].scatter(ts, chans, s=8)
    axes[0].set_ylabel("channel")
    axes[0].grid(True, alpha=0.3)
    axes[1].scatter(ts, rssi, s=8, c="tab:red")
    axes[1].set_ylabel("RSSI (dBm)")
    axes[1].set_xlabel("time (s)")
    axes[1].grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return True
