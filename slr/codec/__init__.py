"""slr.codec — structured-light pattern generation and per-pixel decoding.

Covers SURVEY.md components 1-2 (generators) and 4-8 (mask, Gray decode,
phase decode, temporal + spatial unwrap). Pure-JAX reference path; the
fused Pallas production kernels live in ``slr.kernels`` and are tested for
bit-exactness against this module.
"""

from slr.codec.graycode import (
    gray_encode,
    gray_decode_int,
    generate_gray_patterns,
    decode_gray,
)
from slr.codec.phaseshift import (
    generate_phase_patterns,
    decode_phase,
)
from slr.codec.unwrap import (
    unwrap_temporal,
    spatial_quality_unwrap,
    quality_guided_unwrap,
    quality_guided_repair,
)
from slr.codec.patterns import generate_pattern_stack, decode_stack
from slr.codec.exposure import decode_multi_exposure
from slr.codec.multifreq import (
    generate_multifreq_stack,
    decode_multifreq,
    default_pitches,
)
