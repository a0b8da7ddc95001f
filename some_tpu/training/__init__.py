from some_tpu.training.schedules import WarmupLR, WarmupCosineSchedule  # noqa: F401
from some_tpu.training.optimizers import AdamW, Adam, build_optimizer  # noqa: F401
