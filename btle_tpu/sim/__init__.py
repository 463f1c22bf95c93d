from .ber import BerHarness, golden_rx_dense, reference_max_snr  # noqa: F401
from .channel import apply_ppm, awgn, quantize_int16  # noqa: F401
