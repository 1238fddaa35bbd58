from bridgelang_tpu.models.vision.vit import (
    FUSED_BACKBONES,
    FusedViT,
    VIT_CONFIGS,
    ViT,
    ViTConfig,
    build_vision_backbone,
)

__all__ = ["FUSED_BACKBONES", "FusedViT", "VIT_CONFIGS", "ViT", "ViTConfig", "build_vision_backbone"]
