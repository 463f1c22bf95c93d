"""Batched IQ synthesis for parsed packet descriptors.

Replaces the reference's per-packet serial gen_sample_from_phy_bit loop
(btle_tx.c:3968-4014) with one padded, vmapped modulator call: all packets
of a transmission plan are synthesized in a single device program and the
true per-packet sample counts are tracked host-side.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..phy.modulator import modulate_batch, num_samples
from .descriptor import PacketSpec


@dataclass
class SynthesizedPacket:
    spec: PacketSpec
    i: np.ndarray          # int8
    q: np.ndarray
    space_ms: int


def synthesize(specs: list[PacketSpec], flavor: str = "c", sps: int | None = None
               ) -> list[SynthesizedPacket]:
    """Synthesize all packets with one batched modulator invocation."""
    if not specs:
        return []
    sps = sps or (4 if flavor == "c" else 8)
    phy_bits = [s.phy_bits() for s in specs]
    max_bits = max(len(b) for b in phy_bits)
    batch = np.zeros((len(specs), max_bits), dtype=np.int8)
    for k, b in enumerate(phy_bits):
        batch[k, : len(b)] = b
    bi, bq = modulate_batch(jnp.asarray(batch), flavor=flavor, sps=sps)
    bi = np.asarray(bi)
    bq = np.asarray(bq)
    out = []
    for k, s in enumerate(specs):
        n = num_samples(len(phy_bits[k]), flavor=flavor, sps=sps)
        out.append(SynthesizedPacket(s, bi[k, :n].copy(), bq[k, :n].copy(), s.space_ms))
    return out


def plan_to_stream(packets: list[SynthesizedPacket], sps: int = 4,
                   num_repeat: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a transmission plan into one IQ stream with Space gaps
    (zero samples), the way tx_one_buf + the Space busy-wait would put it
    on the air (btle_tx.c:4307-4331). num_repeat=-1 is rejected here —
    streaming callers should loop themselves."""
    if num_repeat < 0:
        raise ValueError("infinite repeat cannot be materialized")
    segs_i, segs_q = [], []
    for _ in range(num_repeat):
        for p in packets:
            segs_i.append(p.i.astype(np.int16))
            segs_q.append(p.q.astype(np.int16))
            gap = int(p.space_ms * 1000 * sps)  # ms -> samples at sps Msps
            segs_i.append(np.zeros(gap, np.int16))
            segs_q.append(np.zeros(gap, np.int16))
    return np.concatenate(segs_i), np.concatenate(segs_q)
