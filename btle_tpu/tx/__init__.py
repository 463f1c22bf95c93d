from .descriptor import (  # noqa: F401
    ALL_PKT_TYPES,
    DescriptorError,
    PacketSpec,
    parse_descriptor,
    parse_descriptor_sequence,
    read_packet_file,
)
from .synth import SynthesizedPacket, plan_to_stream, synthesize  # noqa: F401
