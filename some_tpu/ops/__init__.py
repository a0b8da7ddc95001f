from some_tpu.ops.decode import (  # noqa: F401
    decode_bounds_to_alignment,
    decode_gaussian_blurred_probs,
    decode_note_sequence,
)
from some_tpu.ops.melspec import LogMelSpec  # noqa: F401
