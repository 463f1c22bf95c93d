"""Curses live-scan TUI: device table + hop state over an event stream.

Role-equivalent of the reference's Textual app (btle_cli/tui): a terminal
dashboard of the ScanAggregator. Implemented on the stdlib curses module
so it runs everywhere; if the optional ``textual`` package is installed
the richer app in this module's ``run_textual`` could be extended — the
curses path is the supported one.

Drive it with any event iterable: a decoded capture, the in-process
sniffer, or an RxProcess stream.
"""

from __future__ import annotations

import curses
import time
from typing import Iterable, Iterator

from .aggregate import ScanAggregator
from .events import Event


def _rows(agg: ScanAggregator, height: int):
    rows = []
    for rec in agg.snapshot(sort="pkts")[: max(0, height)]:
        rssi = f"{rec.last_rssi}" if rec.last_rssi is not None else "-"
        rows.append(
            f"{rec.adv_a:18.18} {rec.name[:20]:20.20} {rec.vendor[:16]:16.16} "
            f"{rec.pkt_count:5d} {100 * rec.crc_ok_ratio():5.1f} {rssi:>5} "
            f"ch{rec.last_channel}"
        )
    return rows


def run_curses(event_iter: Iterable[Event], refresh_s: float = 0.25,
               max_seconds: float | None = None) -> ScanAggregator:
    """Consume events while rendering the live table. Returns the final
    aggregator (also usable headless for tests via max_seconds)."""
    agg = ScanAggregator()
    it: Iterator[Event] = iter(event_iter)

    def loop(stdscr):
        curses.curs_set(0)
        stdscr.nodelay(True)
        last_draw = 0.0
        t0 = time.time()
        exhausted = False
        while True:
            drained = 0
            while drained < 256 and not exhausted:
                try:
                    agg.update(next(it))
                    drained += 1
                except StopIteration:
                    exhausted = True
            now = time.time()
            if now - last_draw >= refresh_s:
                last_draw = now
                stdscr.erase()
                h, w = stdscr.getmaxyx()
                title = (f" btle_tpu scan — {len(agg.devices)} devices, "
                         f"{agg.total_pkts} pkts, "
                         f"{100 * agg.crc_ok_pkts / max(1, agg.total_pkts):.0f}% CRC ok ")
                stdscr.addnstr(0, 0, title.ljust(w - 1), w - 1, curses.A_REVERSE)
                hdr = (f"{'AdvA':18} {'Name':20} {'Vendor':16} "
                       f"{'Pkts':>5} {'CRC%':>5} {'RSSI':>5} Ch")
                stdscr.addnstr(1, 0, hdr, w - 1, curses.A_BOLD)
                for k, row in enumerate(_rows(agg, h - 4)):
                    stdscr.addnstr(2 + k, 0, row, w - 1)
                if agg.hop.following_aa:
                    hop = (f" following {agg.hop.following_aa} "
                           f"ch{agg.hop.current_ch} "
                           f"interval {agg.hop.interval_us}us hop {agg.hop.hop_increment}")
                    stdscr.addnstr(h - 1, 0, hop.ljust(w - 1), w - 1, curses.A_REVERSE)
                else:
                    stdscr.addnstr(h - 1, 0, " q: quit ".ljust(w - 1), w - 1,
                                   curses.A_REVERSE)
                stdscr.refresh()
            ch = stdscr.getch()
            if ch in (ord("q"), 27):
                return
            if exhausted and drained == 0:
                time.sleep(0.05)
            if max_seconds is not None and now - t0 > max_seconds:
                return

    curses.wrapper(loop)
    return agg


def run_headless(event_iter: Iterable[Event]) -> ScanAggregator:
    """The TUI's aggregation loop without a terminal (tests, pipelines)."""
    agg = ScanAggregator()
    for evt in event_iter:
        agg.update(evt)
    return agg
