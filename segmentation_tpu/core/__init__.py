from segmentation_tpu.core.config import DataConfig, ModelConfig, TrainConfig
from segmentation_tpu.core.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicated,
    spatial_sharding,
)
from segmentation_tpu.core.precision import Policy
from segmentation_tpu.core.rng import RngStream

__all__ = [
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "spatial_sharding",
    "replicated",
    "Policy",
    "RngStream",
]
