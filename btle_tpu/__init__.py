"""btle_tpu — a TPU-native BLE (LE-1M PHY) baseband framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
JiaoXianjun/BTLE: GFSK transmit synthesis, phase-difference receive with
access-address correlation / de-whitening / CRC24, PDU codecs, connection
hop tracking, BER simulation, a 40-channel wideband polyphase sniffer, and
multi-chip sharding.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (avoid importing jax at package import)."""
    lazy = {
        "Sniffer": ("btle_tpu.stream", "Sniffer"),
        "SnifferConfig": ("btle_tpu.stream", "SnifferConfig"),
        "WidebandSniffer": ("btle_tpu.wideband", "WidebandSniffer"),
        "WidebandConfig": ("btle_tpu.wideband", "WidebandConfig"),
        "stream_decode": ("btle_tpu.rx", "stream_decode"),
        "golden_decode": ("btle_tpu.rx", "golden_decode"),
        "BerHarness": ("btle_tpu.sim", "BerHarness"),
        "parse_descriptor": ("btle_tpu.tx", "parse_descriptor"),
        "synthesize": ("btle_tpu.tx", "synthesize"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
