from .descriptor import (  # noqa: F401
    ALL_PKT_TYPES,
    DescriptorError,
    PacketSpec,
    parse_descriptor,
    parse_descriptor_sequence,
    read_packet_file,
)
from .synth import (  # noqa: F401
    SynthesizedPacket,
    plan_to_stream,
    plan_to_wideband,
    synthesize,
)
