"""Pallas candidate-decode kernel vs rx.pipeline._decode_candidate
(interpret mode on CPU; compiled kernel exercised by bench.py on TPU).

Random lattices + random positions across all 40 channels, mixed CRC
inits and adv/data flags — the decode outputs must be bit-identical for
every candidate whose window lies inside the lattice (tail candidates
differ by design: the kernel zero-pads where the XLA gather clamps; see
pallas_decode module docstring)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import os

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("BTLE_TPU_TEST_BACKEND") == "tpu":
    pytest.skip("pallas interpret mode is a CPU debugging path",
                allow_module_level=True)

from btle_tpu.rx.pallas_decode import decode_candidates_pallas
from btle_tpu.rx.pipeline import _decode_candidate
from btle_tpu.spec import whitening as W
from btle_tpu.spec.crc24 import CRC24_TABLE, lfsr_init_to_table_init


def test_decode_parity_random(rng):
    m, kb, c = 40, 9000, 16
    bits = rng.integers(0, 2, (m, kb)).astype(np.int8)
    pos = rng.integers(0, kb - 1500, (m, c)).astype(np.int32)
    pos[3, 2] = kb - 100  # tail candidate: clamped differently, excluded
    whiten = np.stack([W.whitening_bits(ch, 336) for ch in range(40)])
    crc = np.full(40, lfsr_init_to_table_init("555555"), np.int32)
    crc[5:10] = 12345     # mixed inits (followed-connection case)
    adv = np.array([i % 3 == 0 for i in range(40)])
    table = jnp.asarray(CRC24_TABLE.astype(np.int32))

    refs = []
    for ch in range(m):
        f = jax.vmap(lambda p, _ch=ch: _decode_candidate(
            p, jnp.asarray(bits[_ch]), jnp.asarray(whiten[_ch]),
            jnp.int32(crc[_ch]), jnp.asarray(adv[_ch]), table, 4))
        plen, cm, pb, lo, _ = f(jnp.asarray(pos[ch]))
        refs.append((np.asarray(plen), np.asarray(cm), np.asarray(pb),
                     np.asarray(lo)))
    ref_plen, ref_cm, ref_pb, ref_lo = (np.stack(x) for x in zip(*refs))

    with pltpu.force_tpu_interpret_mode():
        pb, plen, cm, lo = decode_candidates_pallas(
            jnp.asarray(bits), jnp.asarray(pos), jnp.asarray(whiten),
            jnp.asarray(crc), jnp.asarray(adv), sps=4, interpret=True)
    pb, plen, cm, lo = map(np.asarray, (pb, plen, cm, lo))

    in_range = pos + 32 * 4 + 335 * 4 < kb
    assert in_range.sum() == pos.size - 1
    np.testing.assert_array_equal(ref_plen[in_range], plen[in_range])
    np.testing.assert_array_equal(ref_cm[in_range], cm[in_range])
    np.testing.assert_array_equal(ref_lo[in_range], lo[in_range])
    np.testing.assert_array_equal(ref_pb[in_range], pb[in_range])
