from some_tpu.deployment.export import (  # noqa: F401
    DeploymentExporter, MIDIExtractionExporter, QuantizedMIDIExtractionExporter,
    load_exported,
)
