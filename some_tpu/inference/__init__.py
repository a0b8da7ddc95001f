from some_tpu.inference.base_infer import BaseInference, build_inference  # noqa: F401
from some_tpu.inference.me_infer import MIDIExtractionInference  # noqa: F401
from some_tpu.inference.me_quant_infer import QuantizedMIDIExtractionInference  # noqa: F401
