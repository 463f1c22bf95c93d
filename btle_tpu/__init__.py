"""btle_tpu — a TPU-native BLE (LE-1M PHY) baseband framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
JiaoXianjun/BTLE: GFSK transmit synthesis, phase-difference receive with
access-address correlation / de-whitening / CRC24, PDU codecs, connection
hop tracking, BER simulation, a 40-channel wideband polyphase sniffer, and
multi-chip sharding.
"""

__version__ = "0.1.0"
