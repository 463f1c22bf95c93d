from .demodulator import aa_hits, aa_match_counts, decisions, phase_diff  # noqa: F401
from .modulator import modulate_batch, modulate_c, modulate_python, num_samples  # noqa: F401
