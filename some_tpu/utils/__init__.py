from some_tpu.utils.note_names import (  # noqa: F401
    hz_to_midi, midi_to_hz, midi_to_note, note_to_midi,
)
from some_tpu.utils.pitch import (  # noqa: F401
    denorm_f0, interp_f0, norm_f0, resample_align_curve,
)
