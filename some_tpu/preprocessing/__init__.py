from some_tpu.preprocessing.base_binarizer import BaseBinarizer, BinarizationError  # noqa: F401
from some_tpu.preprocessing.me_binarizer import MIDIExtractionBinarizer  # noqa: F401
from some_tpu.preprocessing.me_quant_binarizer import QuantizedMIDIExtractionBinarizer  # noqa: F401
