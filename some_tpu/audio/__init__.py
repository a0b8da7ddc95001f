from some_tpu.audio.mel import MelSpec, mel_filterbank, log_mel_np  # noqa: F401
from some_tpu.audio.slicer import SilenceSlicer  # noqa: F401
from some_tpu.audio.wavio import load_wav, save_wav, resample  # noqa: F401
