from .nuscenes_dataset import DATASETS, PIPELINES, NuScenesDataset, \
    compose_pipeline
from .builder import build_dataset, build_dataloader, DataLoader, \
    EpochSampler
from .cbgs import CBGSDataset, RepeatDataset
from .custom_nuscenes_dataset import CustomNuScenesDataset
from .pipelines import loading, transforms_3d, formating  # noqa: F401
