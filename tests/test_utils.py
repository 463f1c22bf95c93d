"""Vector-export + FO-alignment tests.

The FO test reproduces the reference's C<->Python alignment methodology
(test_alignment_with_btle_sdr.py): the instantaneous-frequency
trajectories of the 4x C-flavor and 8x python-flavor modulators must agree
on the same packet despite differing oversampling and table resolution.
"""

import subprocess
import sys

import numpy as np
import pytest

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.utils import dump_tx_vectors, instantaneous_freq, tx_stage_vectors

from test_golden import BER_PDU_HEX


class TestStageVectors:
    def test_tx_stages_consistent(self, tmp_path):
        pdu = B.hex_to_bits(BER_PDU_HEX)
        v = tx_stage_vectors(pdu, 37)
        # CRC appends 24 bits; whitener preserves length and header
        assert len(v.info_crc_bits) == len(v.info_bits) + 24
        np.testing.assert_array_equal(v.phy_bits[:40], v.info_crc_bits[:40])
        # modulator output matches the one-call golden TX
        gi, gq, _ = G.btle_tx(pdu, 37)
        np.testing.assert_array_equal(v.i, gi)
        np.testing.assert_array_equal(v.q, gq)

    def test_dump_files_readable(self, tmp_path):
        pdu = B.hex_to_bits(BER_PDU_HEX)
        files = dump_tx_vectors(pdu, str(tmp_path))
        v = tx_stage_vectors(pdu, 37)
        got = np.loadtxt(files["modulator_output_i_ref"], dtype=np.int64)
        np.testing.assert_array_equal(got, v.i)

    def test_vector_tool_end_to_end(self, tmp_path):
        r = subprocess.run(
            [sys.executable, "tools/gen_test_vectors.py", "--out", str(tmp_path),
             "--sps", "8", "--snr", "30"],
            capture_output=True, text=True, timeout=120, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        crc_ok = np.loadtxt(tmp_path / "btle_rx_crc_ok_ref.txt", dtype=np.int64)
        assert int(crc_ok) == 1
        octets = (tmp_path / "btle_rx_pdu_octets_ref.txt").read_text().split()
        assert "".join(octets) == BER_PDU_HEX


class TestFoAlignment:
    def test_c_vs_python_flavor_fo_curves(self):
        """The two modulators differ in oversampling (4 vs 8) and table
        resolution but must produce the same frequency trajectory
        (tolerances from open_btle_baseband_chip.md:270)."""
        pdu = B.hex_to_bits(BER_PDU_HEX)
        i8, q8, _ = G.btle_tx(pdu, 37, sps=8, flavor="python")
        i4, q4, _ = G.btle_tx(pdu, 37, sps=4, flavor="c")
        fo8 = instantaneous_freq(i8, q8, 8)
        fo4 = instantaneous_freq(i4, q4, 4)
        # compare at symbol-rate sample points over the steady-state region
        n_sym = min(len(fo8) // 8, len(fo4) // 4) - 8
        s8 = fo8[8 * 4 : 8 * 4 + (n_sym - 8) * 8 : 8]
        s4 = fo4[4 * 4 : 4 * 4 + (n_sym - 8) * 4 : 4]
        # trajectories are aligned in time up to the differing filter delays;
        # find the best small integer offset and require close agreement
        best = min(
            np.mean(np.abs(s8[: len(s4) - 8] - s4[k : k + len(s8[: len(s4) - 8])]))
            for k in range(8)
        )
        assert best < 0.05, best  # cycles/symbol (peak deviation is 0.25)

    def test_fo_peak_deviation(self):
        """Peak deviation must be ~±h/2 = ±0.25 cycles/symbol."""
        bits = np.tile([1, 1, 1, 1, 0, 0, 0, 0], 8).astype(np.int8)
        i, q, _ = G.gfsk_modulate_python(bits, 8)
        fo = instantaneous_freq(i, q, 8)
        assert 0.2 < np.max(fo) < 0.3
        assert -0.3 < np.min(fo) < -0.2

    @pytest.mark.parametrize("sps,flavor", [(4, "c"), (8, "python")])
    def test_fixed_vs_float_flavor_fo_curves(self, sps, flavor):
        """The fixed-point modulators must track the float golden
        modulator's frequency trajectory at their defined sps — the guard
        that would have caught the round-3 sps=80 misuse (the fixed-point
        phase table is a power of two ONLY at sps 4/8; wrapping it with
        bitwise_and elsewhere silently corrupts the phase).
        Methodology: reference test_alignment_with_btle_sdr.py:40-92."""
        pdu = B.hex_to_bits(BER_PDU_HEX)
        fi_i, fi_q, phy = G.btle_tx(pdu, 37, sps=sps, flavor=flavor)
        fl_i, fl_q = G.gfsk_modulate_float(phy, sps)
        fo_fix = instantaneous_freq(fi_i, fi_q, sps)
        fo_flt = instantaneous_freq(fl_i, fl_q, sps)
        n = min(len(fo_fix), len(fo_flt)) - 4 * sps
        # same sps, so only the small filter-delay offset differs
        best = min(
            np.mean(np.abs(fo_fix[4 * sps : n - 2 * sps]
                           - fo_flt[4 * sps + k : n - 2 * sps + k]))
            for k in range(-2 * sps, 2 * sps + 1)
        )
        assert best < 0.05, (sps, flavor, best)

    @pytest.mark.parametrize("sps", [10, 80])
    def test_fixed_point_flavor_rejects_non_pow2_sps(self, sps):
        """sps values whose phase table is not a power of two must be
        REJECTED, not silently mis-wrapped (the round-3 plan_to_wideband
        bug class). gfsk_modulate_float is the arbitrary-sps path."""
        bits = np.zeros(16, np.int8)
        with pytest.raises(ValueError, match="power-of-two"):
            G.gfsk_modulate_python(bits, sps)
        from btle_tpu.phy.tables import golden_mod_tables

        with pytest.raises(ValueError, match="power-of-two"):
            golden_mod_tables(sps)


class TestModuleVectorHandoff:
    """The complete per-module RTL vector handoff: one emitted file set
    per reference testbench (verilog/*_tb.v, SURVEY.md §4), format- and
    consistency-checked."""

    def test_all_module_sets_emitted(self, tmp_path):
        from btle_tpu.spec import bits as B
        from btle_tpu.utils.vectors import MODULE_TBS, dump_module_vectors

        out = dump_module_vectors(
            B.hex_to_bits("422506050403020119095344"), str(tmp_path), sps=8)
        assert set(out) == set(MODULE_TBS)
        for mod, files in out.items():
            for role, path in files.items():
                assert (tmp_path / path.split("/")[-1]).exists(), (mod, role)

    def test_chain_consistency(self, tmp_path):
        import numpy as np

        from btle_tpu.spec import bits as B
        from btle_tpu.utils.vectors import dump_module_vectors

        sps = 8
        out = dump_module_vectors(
            B.hex_to_bits("4225060504030201aabbccdd"), str(tmp_path), sps=sps)

        def load(mod, role):
            return np.loadtxt(out[mod][role], dtype=np.int64, ndmin=1)

        # upsampler: sps x input length, values are NRZ
        up_in = load("bit_repeat_upsample", "input_bits")
        up_out = load("bit_repeat_upsample", "output_ref")
        assert len(up_out) == sps * len(up_in)
        assert set(np.unique(up_out)) <= {-1, 1}
        # gauss filter consumes the upsampler output
        np.testing.assert_array_equal(load("gauss_filter", "input_nrz"), up_out)
        # vco consumes the filter output; int8 cos/sin out
        np.testing.assert_array_equal(load("vco", "input_freq_words"),
                                      load("gauss_filter", "output_ref"))
        cos = load("vco", "output_cos_ref")
        assert cos.min() >= -128 and cos.max() <= 127
        # modulator refs equal the end-to-end tx refs
        np.testing.assert_array_equal(load("gfsk_modulation", "output_i_ref"),
                                      load("btle_tx", "output_i_ref"))
        # CRC module: output extends input by 24 bits
        assert len(load("crc24", "output_ref")) == \
            len(load("crc24", "input_bits")) + 24
        # AA search: the found position is a real match of the pattern
        bits = load("search_unique_bit_sequence", "input_bits")
        pattern = load("search_unique_bit_sequence", "input_pattern")
        k = int(load("search_unique_bit_sequence", "output_position_ref")[0])
        np.testing.assert_array_equal(bits[k:k + 32], pattern)
        # rx core: decode verdict on the clean loopback is CRC OK and the
        # recovered octets match the controller set
        assert load("btle_rx_core", "output_crc_ok_ref")[0] == 1
        np.testing.assert_array_equal(
            load("btle_rx_core", "output_pdu_octets_ref"),
            load("btle_controller", "output_pdu_octets_ref"))
