from some_tpu.nn.conformer import (  # noqa: F401
    ConformerBlock, ConvModule, DualStreamBlock, FeedForward, MidiConformer,
    SelfAttention,
)
from some_tpu.nn.model import MidiExtractor  # noqa: F401
