from tdeed_tpu.data.registry import DATASETS, DatasetSpec, get_spec  # noqa: F401
