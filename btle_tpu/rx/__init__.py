from .decoder import (  # noqa: F401
    BlockDecodeResult,
    DecodedPacket,
    GoldenDecodeResult,
    golden_decode,
    stream_decode,
)
from .pipeline import decode_block, required_halo, scan_block  # noqa: F401
