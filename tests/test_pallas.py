"""Pallas fused-scan kernel vs the XLA path (interpret mode on CPU;
compiled path exercised on TPU hardware via bench/dev runs)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import os

from btle_tpu.golden import model as G

if os.environ.get("BTLE_TPU_TEST_BACKEND") == "tpu":
    pytest.skip("pallas interpret mode is a CPU debugging path; the "
                "compiled kernel is exercised by dev benchmarks",
                allow_module_level=True)
from btle_tpu.phy.pallas_scan import scan_block_fused
from btle_tpu.rx.pipeline import scan_block
from btle_tpu.spec import bits as B


@pytest.mark.parametrize("sps,lag", [(4, 1), (8, 8)])
def test_fused_matches_xla(sps, lag, rng):
    pdu = B.bytes_to_bits(
        np.concatenate([[0x40, 12], rng.integers(0, 256, 12, dtype=np.uint8)]).astype(np.uint8)
    )
    ci, cq, _ = G.btle_tx(pdu, 37, sps=sps,
                          flavor="c" if sps == 4 else "python")
    n = 20000
    i = rng.integers(-5, 6, n).astype(np.int16)
    q = rng.integers(-5, 6, n).astype(np.int16)
    i[3000 : 3000 + len(ci)] += np.asarray(ci, np.int16)
    q[3000 : 3000 + len(cq)] += np.asarray(cq, np.int16)
    aa = jnp.asarray(B.hex_to_bits("d6be898e"))
    mask = jnp.asarray(np.ones(32, np.int8))

    h1, b1 = scan_block(jnp.asarray(i), jnp.asarray(q), aa, mask, sps=sps, lag=lag)
    with pltpu.force_tpu_interpret_mode():
        h2, b2 = scan_block_fused(jnp.asarray(i), jnp.asarray(q), aa, mask,
                                  sps=sps, lag=lag)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert np.asarray(h1).sum() >= 1  # the packet's AA is found
