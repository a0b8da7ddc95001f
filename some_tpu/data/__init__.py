from some_tpu.data.indexed_dataset import IndexedDataset, IndexedDatasetWriter  # noqa: F401
from some_tpu.data.sampler import BucketBatchSampler, EvalBatchSampler  # noqa: F401
from some_tpu.data.collate import collate_nd, pad_to_bucket  # noqa: F401
