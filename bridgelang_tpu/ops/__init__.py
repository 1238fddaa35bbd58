from bridgelang_tpu.ops.image_ops import (
    ImageTowerSpec,
    ImageTransformConfig,
    preprocess_batch,
    preprocess_image,
    transform_config_for_backbone,
)

__all__ = [
    "ImageTowerSpec",
    "ImageTransformConfig",
    "preprocess_batch",
    "preprocess_image",
    "transform_config_for_backbone",
]
