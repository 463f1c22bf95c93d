"""Known-answer self-test of the fused wideband pipeline
(wideband/selftest.py): the deployment-time guard against kernels that
compile and run but decode nothing (a miscompile class interpret-mode
tests cannot catch — seen on hardware with an AA_GRP=4 roll variant).
Here the selftest itself is exercised on the CPU interpret path, plus
its failure detection via injected-fault scan functions.
"""

import numpy as np
import pytest

from btle_tpu.wideband.selftest import (SELFTEST_CHANNELS,
                                        WidebandSelfTestError,
                                        fused_selftest)


class TestFusedSelftest:
    def test_passes_exact_mode(self):
        positions = fused_selftest(compute_dtype="f32")
        assert sorted(positions) == sorted(SELFTEST_CHANNELS)
        # packets were injected in channel order at increasing offsets
        chron = [positions[ch] for ch in SELFTEST_CHANNELS]
        assert chron == sorted(chron)

    def test_passes_production_mode(self):
        positions = fused_selftest(compute_dtype="bf16x2w")
        assert sorted(positions) == sorted(SELFTEST_CHANNELS)

    def test_detects_dead_pipeline(self):
        """A kernel returning no CRC-OK candidates must fail loudly."""
        from btle_tpu.wideband.fused import wideband_scan_fused

        def dead(*a, **kw):
            out = dict(wideband_scan_fused(*a, **kw))
            out["crc_ok"] = np.zeros_like(np.asarray(out["crc_ok"]))
            return out

        with pytest.raises(WidebandSelfTestError, match="no CRC-OK"):
            fused_selftest(scan_fn=dead)

    def test_detects_corrupt_payload(self):
        from btle_tpu.wideband.fused import wideband_scan_fused

        def corrupt(*a, **kw):
            out = dict(wideband_scan_fused(*a, **kw))
            pdu = np.array(out["pdu_bytes"])
            pdu[..., 2] ^= 0xFF  # flip first payload byte everywhere
            out["pdu_bytes"] = pdu
            return out

        with pytest.raises(WidebandSelfTestError, match="none byte-match"):
            fused_selftest(scan_fn=corrupt)

    def test_detects_ghost_channels(self):
        """CRC-OK packets on channels with no injected signal = leakage."""
        from btle_tpu.wideband.channelizer import channel_to_bin
        from btle_tpu.wideband.fused import wideband_scan_fused

        def ghosting(*a, **kw):
            out = dict(wideband_scan_fused(*a, **kw))
            ok = np.array(out["crc_ok"])
            ok[channel_to_bin(5), 0] = True
            out["crc_ok"] = ok
            return out

        with pytest.raises(WidebandSelfTestError, match="ghost"):
            fused_selftest(scan_fn=ghosting)

    def test_cli_flag(self, tmp_path, capsys):
        """`wideband --selftest` runs the KAT before scanning."""
        from btle_tpu.cli.app import main

        rng = np.random.default_rng(1)
        iq = (rng.normal(0, 0.01, 40_000) + 0).astype(np.float32)
        f = tmp_path / "noise.bin"
        iq.tofile(f)
        main(["wideband", "--bin", str(f), "--selftest"])
        err = capsys.readouterr().err
        assert "self-test OK" in err

    def test_passes_xla_pipeline(self):
        """pipeline="xla" exercises the fallback scan path (what a
        non-fused deployment actually runs)."""
        positions = fused_selftest(pipeline="xla")
        assert sorted(positions) == sorted(SELFTEST_CHANNELS)
