from .profiling import BlockStats, device_trace  # noqa: F401
from .spectrum import occupancy, waterfall, waterfall_extent  # noqa: F401
from .vectors import (  # noqa: F401
    dump_rx_vectors,
    dump_tx_vectors,
    instantaneous_freq,
    tx_stage_vectors,
)
