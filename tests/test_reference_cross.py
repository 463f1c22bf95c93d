"""Cross-validation against the ACTUAL reference implementation.

Imports the reference's golden model (read-only, from /root/reference) and
checks both directions at every layer: their TX decodes with our RX, our
TX decodes with their RX, and the bit-level primitives agree on random
vectors. This is the hardest parity evidence available without radios.

The reference module writes table dumps relative to CWD on first call
(btlelib.py:90-91,155), so the fixture runs it inside a sandbox directory.
"""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REF_PY = "/root/reference/python"


@pytest.fixture(scope="module")
def btlelib(tmp_path_factory):
    if not os.path.isdir(REF_PY):
        pytest.skip("reference python model not available")
    # sandbox: btlelib dumps ../verilog/*.txt relative to CWD on first use
    work = tmp_path_factory.mktemp("refwork") / "python"
    work.mkdir()
    (work.parent / "verilog").mkdir()
    old_cwd = os.getcwd()
    os.chdir(work)
    sys.path.insert(0, REF_PY)
    try:
        import btlelib

        yield btlelib
    finally:
        os.chdir(old_cwd)
        sys.path.remove(REF_PY)


PDU_HEX = "422506050403020119095344522f426c7565746f6f74682f4c6f772f456e657267791234567890"


class TestPrimitives:
    def test_crc24_agrees(self, btlelib, rng):
        from btle_tpu.spec import bits as B
        from btle_tpu.spec import crc24 as C

        for _ in range(5):
            bits = rng.integers(0, 2, 120).astype(np.int8)
            init = B.hex_to_bits("555555")
            ours = C.crc24_bits(bits, init)
            theirs = btlelib.crc24_core(bits, init.copy())
            np.testing.assert_array_equal(ours, theirs)

    def test_whitening_agrees(self, btlelib, rng):
        from btle_tpu.spec import whitening as W

        for ch in (0, 9, 21, 37, 39):
            bits = rng.integers(0, 2, 200).astype(np.int8)
            ours = W.whiten_bits(bits, ch)
            theirs = btlelib.scramble_core(bits, ch)
            np.testing.assert_array_equal(ours, theirs)

    def test_hex_bits_agree(self, btlelib):
        from btle_tpu.spec import bits as B

        for s in ("d6be898e", "aa", "1b0a8560", PDU_HEX):
            np.testing.assert_array_equal(B.hex_to_bits(s), btlelib.hex_string_to_bit(s))
            assert B.bits_to_hex(B.hex_to_bits(s)) == btlelib.bit_to_hex_string(B.hex_to_bits(s))

    def test_gauss_fir_agrees(self, btlelib):
        from btle_tpu.golden import gauss_fir

        np.testing.assert_allclose(gauss_fir(8), btlelib.gauss_fir_gen(), rtol=1e-12)


class TestModulatorParity:
    def test_tx_iq_identical(self, btlelib):
        """Their btle_tx and our golden TX produce IDENTICAL int8 IQ."""
        from btle_tpu.golden import btle_tx as our_tx
        from btle_tpu.spec import bits as B

        pdu = B.hex_to_bits(PDU_HEX)
        ti, tq, tphy, _ = btlelib.btle_tx(pdu.copy(), 37)
        oi, oq, ophy = our_tx(pdu, 37)
        np.testing.assert_array_equal(ophy, tphy)
        np.testing.assert_array_equal(oi, ti)
        np.testing.assert_array_equal(oq, tq)


class TestCrossDecode:
    def test_their_tx_our_rx(self, btlelib, rng):
        """Reference-synthesized packets (with their channel impairments)
        decode bit-exactly through our device pipeline."""
        from btle_tpu.rx import golden_decode
        from btle_tpu.spec import bits as B

        pdu = B.hex_to_bits(PDU_HEX)
        ti, tq, _, _ = btlelib.btle_tx(pdu.copy(), 37)
        i2, q2, _, _ = btlelib.add_freq_sampling_error(ti, tq, 20.0)
        i3, q3 = btlelib.add_noise(i2, q2, 20.0)
        res = golden_decode(np.int16(i3), np.int16(q3), 37)
        assert res.crc_ok
        np.testing.assert_array_equal(res.pdu_bits, pdu)

    def test_our_tx_their_rx(self, btlelib, rng):
        """Our JAX-modulated packets decode through the reference receiver."""
        import jax.numpy as jnp

        from btle_tpu.golden import assemble_phy_bits
        from btle_tpu.phy import modulate_python
        from btle_tpu.spec import bits as B

        payload = rng.integers(0, 256, 20, dtype=np.uint8)
        pdu = B.bytes_to_bits(np.concatenate([[0x40, 20], payload]).astype(np.uint8))
        phy = assemble_phy_bits(pdu, 37)
        i8, q8 = modulate_python(jnp.asarray(phy))
        rx_pdu, crc_ok, plen, *_ = btlelib.btle_rx(
            np.asarray(i8), np.asarray(q8), 37)
        assert crc_ok
        assert plen == 20
        np.testing.assert_array_equal(np.asarray(rx_pdu), pdu)

    def test_decision_agreement_under_noise(self, btlelib, rng):
        """Packet-level verdicts agree with the reference receiver across
        noisy trials (same IQ into both receivers)."""
        from btle_tpu.rx import golden_decode
        from btle_tpu.spec import bits as B

        pdu = B.hex_to_bits(PDU_HEX)
        agree = 0
        trials = 12
        for t in range(trials):
            ti, tq, _, _ = btlelib.btle_tx(pdu.copy(), 37)
            i2, q2, _, _ = btlelib.add_freq_sampling_error(ti, tq, 30.0)
            i3, q3 = btlelib.add_noise(i2, q2, 12.5)
            i3 = np.int16(i3)
            q3 = np.int16(q3)
            theirs = btlelib.btle_rx(i3.copy(), q3.copy(), 37)
            ours = golden_decode(i3, q3, 37)
            if bool(theirs[1]) == bool(ours.crc_ok):
                agree += 1
                if theirs[1]:
                    np.testing.assert_array_equal(ours.pdu_bits, np.asarray(theirs[0]))
        assert agree == trials
