"""Full-depth BER regression (reference criterion, @slow).

Regenerates the 16-point / 100-300-packet sweep of BER_CURVES.md and
asserts BER <= 0.1% at all four ppm anchors — the reference's own pass
bar (open_btle_baseband_chip.md:299, python/test_btle_ber.py:26-80) —
instead of the fast tests' reduced-depth proxy.

Run with:  python -m pytest tests/test_ber_full.py -m slow -q
(or:       python tools/ber_sweep.py)
"""

import pytest

jax = pytest.importorskip("jax")

from btle_tpu.sim.sweep import (
    ANCHOR_CRITERION,
    POINT_PLAN,
    PPMS,
    anchors_pass,
    run_sweep,
)


@pytest.mark.slow
def test_full_depth_sweep_meets_reference_anchors():
    points = run_sweep(seed=11)
    assert len(points) == len(PPMS) * len(POINT_PLAN)
    anchors = [p for p in points if p.is_anchor]
    assert len(anchors) == len(PPMS)
    for p in anchors:
        # ~93,600 bits per anchor point (300 max-length packets)
        assert p.bits >= 90_000
        assert p.ber <= ANCHOR_CRITERION, (p.ppm, p.snr_db, p.ber)
    assert anchors_pass(points)
    # waterfall shape: each ppm's lowest point is markedly worse
    for ppm in PPMS:
        curve = [p for p in points if p.ppm == ppm]
        assert curve[0].ber > 10 * max(curve[-1].ber, 1e-6)
