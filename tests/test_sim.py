"""Channel-sim + BER harness tests (BASELINE config 3).

Statistical pass criteria follow the reference's published anchors
(test_btle_ber.py:29-30, open_btle_baseband_chip.md:65-66): at the
ppm-dependent max-SNR anchor the BER must be at/below ~0.1-0.5%, and it
must degrade sharply a few dB below the anchor.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from btle_tpu.golden import model as G
from btle_tpu.sim import BerHarness, apply_ppm, reference_max_snr
from btle_tpu.spec import bits as B

from test_golden import BER_PDU_HEX


class TestChannelModels:
    def test_apply_ppm_matches_golden(self):
        pdu_bits = B.hex_to_bits(BER_PDU_HEX)
        i, q, _ = G.btle_tx(pdu_bits, 37)
        gi, gq, _ = G.add_freq_sampling_error(i, q, 30.0)
        ji, jq = apply_ppm(jnp.asarray(i), jnp.asarray(q), jnp.float32(30.0), 8)
        # float32 vs float64 model: agree to a fraction of an LSB
        assert np.max(np.abs(np.asarray(ji) - gi)) < 0.05
        assert np.max(np.abs(np.asarray(jq) - gq)) < 0.05

    def test_reference_max_snr_interp(self):
        assert reference_max_snr(0) == 11
        assert reference_max_snr(50) == 26
        assert reference_max_snr(22.5) == 13.5


class TestBer:
    @pytest.mark.parametrize("ppm", [0.0, 50.0])
    def test_anchor_snr_ber(self, ppm):
        h = BerHarness()
        snr = reference_max_snr(ppm)
        ber, ok, nbits = h.ber_point(snr, ppm, 60, seed=11)
        # reference curve: ~0.1% BER at the anchor; allow 0.5% slack for
        # the reduced packet count
        assert ber <= 5e-3, (ppm, snr, ber)
        assert ok >= 55

    def test_degradation_below_anchor(self):
        h = BerHarness()
        ber_hi, _, _ = h.ber_point(11.0, 0.0, 40, seed=5)
        ber_lo, _, _ = h.ber_point(7.0, 0.0, 40, seed=5)
        assert ber_lo > ber_hi
        assert ber_lo > 1e-3

    def test_clean_channel_zero_errors(self):
        h = BerHarness()
        ber, ok, nbits = h.ber_point(40.0, 0.0, 20, seed=6)
        assert ber == 0.0
        # the harness rounds up to its fixed batch width
        assert ok == nbits // (39 * 8)
