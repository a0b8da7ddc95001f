"""Class registry: dotted-path resolution with reference-path aliases.

The reference selects every pluggable component through dotted class paths in
YAML (``task_cls``, ``model_cls``, ``binarizer_cls``, ``optimizer_cls``,
``scheduler_cls`` — reference: utils/__init__.py:221-230). To keep published
SOME config files loadable verbatim, the torch-world paths are aliased onto
the SOME-TPU equivalents here.
"""
from __future__ import annotations

import importlib
import inspect
from typing import Any, Dict

# Reference (PyTorch) class path -> SOME-TPU class path.
# (reference: inference/__init__.py:5-8, deployment/__init__.py:5-8,
#  configs/base.yaml + configs/*.yaml class keys)
REFERENCE_ALIASES: Dict[str, str] = {
    # models
    "modules.model.Gmidi_conform.midi_conforms": "some_tpu.nn.model.MidiExtractor",
    # tasks
    "training.BaseTask": "some_tpu.training.base_task.BaseTask",
    "training.MIDIExtractionTask": "some_tpu.training.me_task.MIDIExtractionTask",
    "training.QuantizedMIDIExtractionTask":
        "some_tpu.training.me_quant_task.QuantizedMIDIExtractionTask",
    # binarizers
    "preprocessing.BaseBinarizer": "some_tpu.preprocessing.base_binarizer.BaseBinarizer",
    "preprocessing.MIDIExtractionBinarizer":
        "some_tpu.preprocessing.me_binarizer.MIDIExtractionBinarizer",
    "preprocessing.QuantizedMIDIExtractionBinarizer":
        "some_tpu.preprocessing.me_quant_binarizer.QuantizedMIDIExtractionBinarizer",
    # optimizers / schedulers (torch classnames -> optax-based factories)
    "torch.optim.AdamW": "some_tpu.training.optimizers.AdamW",
    "torch.optim.Adam": "some_tpu.training.optimizers.Adam",
    "lr_scheduler.scheduler.WarmupLR": "some_tpu.training.schedules.WarmupLR",
    "lr_scheduler.scheduler.SGDRLR": "some_tpu.training.extra_schedules.SGDRLR",
    "lr_scheduler.scheduler.LSGDRLR": "some_tpu.training.extra_schedules.LSGDRLR",
    "lr_scheduler.scheduler.V2LSGDRLR": "some_tpu.training.extra_schedules.V2LSGDRLR",
    "lr_scheduler.scheduler.V3LSGDRLR": "some_tpu.training.extra_schedules.V3LSGDRLR",
    "lr_scheduler.scheduler.NoamHoldAnnealing":
        "some_tpu.training.extra_schedules.NoamHoldAnnealing",
    "utils.training_utils.WarmupCosineSchedule":
        "some_tpu.training.schedules.WarmupCosineSchedule",
}

# task_cls -> inference engine (reference: inference/__init__.py:5-8)
TASK_INFERENCE_MAPPING: Dict[str, str] = {
    "training.MIDIExtractionTask": "some_tpu.inference.me_infer.MIDIExtractionInference",
    "training.QuantizedMIDIExtractionTask":
        "some_tpu.inference.me_quant_infer.QuantizedMIDIExtractionInference",
    "some_tpu.training.me_task.MIDIExtractionTask":
        "some_tpu.inference.me_infer.MIDIExtractionInference",
    "some_tpu.training.me_quant_task.QuantizedMIDIExtractionTask":
        "some_tpu.inference.me_quant_infer.QuantizedMIDIExtractionInference",
}

# task_cls -> deployment module (reference: deployment/__init__.py:5-8)
TASK_DEPLOYMENT_MAPPING: Dict[str, str] = {
    "training.MIDIExtractionTask": "some_tpu.deployment.export.MIDIExtractionExporter",
    "training.QuantizedMIDIExtractionTask":
        "some_tpu.deployment.export.QuantizedMIDIExtractionExporter",
    "some_tpu.training.me_task.MIDIExtractionTask":
        "some_tpu.deployment.export.MIDIExtractionExporter",
    "some_tpu.training.me_quant_task.QuantizedMIDIExtractionTask":
        "some_tpu.deployment.export.QuantizedMIDIExtractionExporter",
}


def resolve_class(cls_path: str) -> type:
    """Import and return the class named by a dotted path (aliases applied)."""
    cls_path = REFERENCE_ALIASES.get(cls_path, cls_path)
    module_name, _, cls_name = cls_path.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


def filter_kwargs(kwargs: dict, callable_obj: Any) -> dict:
    """Drop kwargs the callable's signature does not accept.

    Mirrors the reference's permissive constructor-kwarg filtering
    (reference: utils/__init__.py:128-142).
    """
    sig = inspect.signature(callable_obj)
    if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
        return dict(kwargs)
    accepted = {
        p.name for p in sig.parameters.values()
        if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
    }
    return {k: v for k, v in kwargs.items() if k in accepted}


def build_object(cls_path: str, parent_cls: type | None = None, *args, **kwargs):
    """Instantiate a class from its dotted path with signature-filtered kwargs."""
    cls_type = resolve_class(cls_path)
    if parent_cls is not None and not issubclass(cls_type, parent_cls):
        raise TypeError(f"{cls_type} is not a subclass of {parent_cls}")
    return cls_type(*args, **filter_kwargs(kwargs, cls_type))
