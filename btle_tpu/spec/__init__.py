from . import bits, channels, constants, crc24, whitening  # noqa: F401
