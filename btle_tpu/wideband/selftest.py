"""Known-answer self-test (KAT) for the fused wideband pipeline.

A Mosaic/XLA lowering regression can produce a kernel that compiles,
runs, and returns well-formed arrays — that decode NOTHING. Observed on
real hardware in this repo's history: an AA-correlation roll-group
variant (AA_GRP=4) passed every interpret-mode test and timed fine on
noise input, yet decoded zero packets on the physical chip (the strided
rotate or the unaligned-lane weight operand miscompiles). Interpret-mode
CI cannot catch that class of bug, and a throughput benchmark on noise
cannot either — only a known-answer run ON THE ATTACHED BACKEND can.

`fused_selftest()` synthesizes a deterministic 80 Msps scene (three ADV
packets with fixed payloads on channels 37 / 17 / 39), runs it through
`wideband_scan_fused` with the given configuration, and verifies every
injected packet decodes CRC-OK with byte-exact PDU content on its
channel. It is the TPU-era analog of the reference's loopback quick
tests (BTLE README "quick test" flow: btle_tx air -> btle_rx decode).

Intended use: once per deployment / backend / kernel-config change —
e.g. `btle wideband --selftest ...` before a long capture run, or
`fused_selftest()` at service start-up. One extra compile (~30 s-6 min
through a tunneled remote compiler, seconds locally); the scene itself
is ~3.5 ms of air.
"""

from __future__ import annotations

import numpy as np


class WidebandSelfTestError(RuntimeError):
    """The fused pipeline failed to reproduce the known answer."""


SELFTEST_CHANNELS = (37, 17, 39)
_N_WB = 280_000  # 3.5 ms of 80 Msps air


def _scene(phy: str = "1m"):
    """Deterministic packets -> (wi, wq, expected {channel: pdu bytes}).

    Built through the SHIPPED TX path — descriptor parse ->
    tx.synth.scene_to_wideband (the same composition `tx --wideband-out`
    runs) — so the hardware gate validates the code users run, not a
    private synthesis twin. Expected PDU bytes are derived from the
    parsed specs, keeping the known answer self-consistent.
    """
    from ..spec import bits as B
    from ..tx import parse_descriptor_sequence
    from ..tx.synth import scene_to_wideband

    rng = np.random.default_rng(0xB7E)
    descs = []
    for k, ch in enumerate(SELFTEST_CHANNELS):
        payload = rng.integers(0, 256, 10 + 2 * k, dtype=np.uint8)
        if ch in (37, 38, 39):
            descs.append(
                f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                f"-AdvA-{bytes(payload[:6]).hex()}"
                f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            descs.append(
                f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
    specs, _ = parse_descriptor_sequence(descs)
    if phy == "2m":
        specs = [s.to_2m() for s in specs]
    placed = [(s, 12_000 + 80_000 * k) for k, s in enumerate(specs)]
    expected = {s.channel: np.asarray(
        B.bits_to_bytes(s.info_bits[s.pdu_start:]), np.uint8)
        for s in specs}
    # light deterministic noise so bit decisions are not degenerate ties
    wi, wq = scene_to_wideband(placed, _N_WB, noise_std=0.01, seed=0xB7E)
    return wi, wq, expected


def fused_selftest(compute_dtype: str = "f32", tile: int | None = None,
                   inner: str | None = None, decode: str = "pallas",
                   interpret: bool | None = None, scan_fn=None,
                   max_candidates: int = 8,
                   pipeline: str = "fused", phy: str = "1m",
                   cutoff_mhz: float | None = None) -> dict[int, int]:
    """Run the known-answer scene through the scan pipeline and verify.

    Arguments mirror `wideband_scan_fused`'s configuration so the test
    exercises EXACTLY the mode about to be deployed — pass the SAME
    compute_dtype/tile/inner the deployment will use, or
    pipeline="xla" to test the XLA fallback path instead (the kernel
    kwargs are then ignored). `interpret=None` auto-selects interpret
    mode off-TPU (CPU cannot compile Mosaic). Returns
    {channel: hit position} on success; raises WidebandSelfTestError
    naming every missing/corrupt packet otherwise. `scan_fn` overrides
    the scanned function (test seam; fused-style signature).
    """
    import jax
    import jax.numpy as jnp

    from .channelizer import bin_to_channel, channel_to_bin
    from .fused import wideband_scan_fused
    from .sniffer import default_scan_tables, wideband_scan

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    from .sniffer import ch_sps_for_phy

    wi, wq, expected = _scene(phy=phy)
    aa, mask, whiten, crc, adv = default_scan_tables()
    sps = ch_sps_for_phy(phy)   # 4 Msps channels: 2 samples/sym @ 2M
    from .sniffer import cutoff_for_phy

    if cutoff_mhz is None:
        cutoff_mhz = cutoff_for_phy(phy)   # phy-aware prototype

    if scan_fn is not None or pipeline == "fused":
        fn = scan_fn or wideband_scan_fused
        out = fn(jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc,
                 adv, sps=sps, lag=sps, max_candidates=max_candidates,
                 compute_dtype=compute_dtype, tile=tile, inner=inner,
                 decode=decode, interpret=interpret, cutoff_mhz=cutoff_mhz)
    elif pipeline == "xla":
        out = wideband_scan(jnp.asarray(wi), jnp.asarray(wq), aa, mask,
                            whiten, crc, adv, sps=sps, lag=sps,
                            max_candidates=max_candidates,
                            cutoff_mhz=cutoff_mhz)
    else:
        raise ValueError(f"unknown pipeline {pipeline!r}")
    out = {k: np.asarray(v) for k, v in out.items()}

    failures, positions = [], {}
    for ch, pdu in expected.items():
        m = channel_to_bin(ch)
        ok_slots = np.flatnonzero(out["crc_ok"][m])
        matched = False
        for k in ok_slots:
            got = out["pdu_bytes"][m, k, : len(pdu)].astype(np.uint8)
            if np.array_equal(got, pdu):
                positions[ch] = int(out["pos"][m, k])
                matched = True
                break
        if not matched:
            if len(ok_slots) == 0:
                failures.append(
                    f"channel {ch}: no CRC-OK candidate "
                    f"(num_hits={int(out['num_hits'][m])})")
            else:
                failures.append(
                    f"channel {ch}: {len(ok_slots)} CRC-OK candidate(s) "
                    "but none byte-match the injected PDU")
    # any OTHER channel decoding CRC-OK would be a ghost (filterbank
    # leakage or whitening/CRC row confusion) — equally a failure
    inject_bins = {channel_to_bin(ch) for ch in expected}
    ghosts = [bin_to_channel(m) for m in range(40)
              if m not in inject_bins and out["crc_ok"][m].any()]
    if ghosts:
        failures.append(f"ghost CRC-OK packets on channels {sorted(ghosts)}")

    if failures:
        raise WidebandSelfTestError(
            f"wideband self-test FAILED (pipeline={pipeline}, "
            f"compute_dtype={compute_dtype}, inner={inner}, tile={tile}, "
            f"decode={decode}, interpret={interpret}, phy={phy}, "
            f"backend={jax.default_backend()}): " + "; ".join(failures))
    return positions
