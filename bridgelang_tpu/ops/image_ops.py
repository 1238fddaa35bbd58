"""Image preprocessing as fused, jittable XLA ops.

TPU-native re-design of the reference's host-side torchvision pipeline
(reference: prismatic/extern/hf/processing_prismatic.py:128-145 — per-tower
Resize -> CenterCrop -> ToTensor -> Normalize, with optional letterbox pad,
fused towers channel-stacked into [2*3, H, W]). Here the whole transform is a
single jitted function over uint8 HWC frames, so it runs on-device (or fused
on host CPU via XLA) and batches trivially with vmap — instead of per-image
PIL/torch calls.

Resize parity: the reference uses PIL/torchvision bicubic with antialias=True.
`jax.image.resize(method="bicubic", antialias=True)` implements the same
Keys cubic kernel (A = -0.5) with kernel-width scaling on downsample; parity
tests in tests/test_image_ops.py bound the drift against PIL.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Per-tower normalization constants (timm data configs for the backbones the
# reference instantiates; see reference base_vision.py + timm model cards).
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
INCEPTION_MEAN = (0.5, 0.5, 0.5)  # SigLIP
INCEPTION_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class ImageTowerSpec:
    """One vision tower's preprocessing: target size + normalization."""

    size: int = 224
    mean: Tuple[float, float, float] = INCEPTION_MEAN
    std: Tuple[float, float, float] = INCEPTION_STD
    interpolation: str = "bicubic"


@dataclasses.dataclass(frozen=True)
class ImageTransformConfig:
    """Full transform: resize strategy + one spec per (fused) tower.

    `strategy` semantics (reference: base_vision.py:154-181):
      resize-naive : resize directly to (size, size)
      resize-crop  : resize shortest side to size, then center crop
      letterbox    : pad to square with per-tower mean fill, then resize
    """

    strategy: str = "resize-naive"
    towers: Tuple[ImageTowerSpec, ...] = (ImageTowerSpec(),)

    @property
    def num_towers(self) -> int:
        return len(self.towers)


# Canonical configs for the registered vision backbones.
TOWER_SPECS: Dict[str, ImageTowerSpec] = {
    "dinov2": ImageTowerSpec(224, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
    "siglip": ImageTowerSpec(224, INCEPTION_MEAN, INCEPTION_STD),
    "siglip-384": ImageTowerSpec(384, INCEPTION_MEAN, INCEPTION_STD),
    "clip": ImageTowerSpec(224, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD),
    "clip-336": ImageTowerSpec(336, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD),
    "in1k": ImageTowerSpec(224, IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
}


def resize(img: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bicubic") -> jnp.ndarray:
    """Antialiased resize of an HWC float image (values in [0, 1])."""
    h, w = out_hw
    return jax.image.resize(img, (h, w, img.shape[-1]), method=method, antialias=True)


def resize_shortest_side(img: jnp.ndarray, size: int, method: str = "bicubic") -> jnp.ndarray:
    """torchvision Resize(int) semantics: scale shortest side to `size`,
    preserving aspect ratio (rounded like torchvision)."""
    h, w = img.shape[0], img.shape[1]
    if h <= w:
        new_h, new_w = size, max(1, int(round(w * size / h)))
    else:
        new_h, new_w = max(1, int(round(h * size / w))), size
    return resize(img, (new_h, new_w), method)


def center_crop(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torchvision CenterCrop semantics (pads with zeros if image smaller)."""
    h, w = img.shape[0], img.shape[1]
    th, tw = out_hw
    if h < th or w < tw:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        img = jnp.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
        h, w = img.shape[0], img.shape[1]
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    return img[top : top + th, left : left + tw, :]


def letterbox_pad(img: jnp.ndarray, fill: Sequence[float]) -> jnp.ndarray:
    """Pad to square with a constant fill (reference:
    processing_prismatic.py:24-29 — symmetric border, int((max-d)/2) per side,
    which under-pads by one pixel on odd deltas exactly like TVF.pad)."""
    h, w = img.shape[0], img.shape[1]
    max_wh = max(h, w)
    ph, pw = int((max_wh - h) / 2), int((max_wh - w) / 2)
    fill_arr = jnp.asarray(fill, dtype=img.dtype)
    padded = jnp.pad(img, ((ph, ph), (pw, pw), (0, 0)))
    if ph == 0 and pw == 0:
        return img
    mask = jnp.zeros((img.shape[0], img.shape[1]), dtype=bool)
    mask = jnp.pad(mask, ((ph, ph), (pw, pw)), constant_values=True)
    return jnp.where(mask[..., None], fill_arr, padded)


def normalize(img: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    std_a = jnp.asarray(std, dtype=img.dtype)
    return (img - mean_a) / std_a


def _transform_one_tower(img01: jnp.ndarray, spec: ImageTowerSpec, strategy: str) -> jnp.ndarray:
    if strategy == "resize-naive":
        out = resize(img01, (spec.size, spec.size), spec.interpolation)
    elif strategy == "resize-crop":
        out = center_crop(resize_shortest_side(img01, spec.size, spec.interpolation), (spec.size, spec.size))
    elif strategy == "letterbox":
        out = resize(letterbox_pad(img01, spec.mean), (spec.size, spec.size), spec.interpolation)
    else:
        raise ValueError(f"Unknown image resize strategy {strategy!r}")
    return normalize(out, spec.mean, spec.std)


def preprocess_image(
    image_u8: jnp.ndarray,
    config: ImageTransformConfig,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """uint8 HWC frame -> channel-stacked [num_towers*3, H, W] normalized image.

    Matches the HF twin's channel-stack contract
    (reference: processing_prismatic.py:134-144) so the model side can split
    [6, H, W] into per-tower [3, H, W]. Fully traceable: wrap in jax.jit (one
    compile per input resolution) or vmap for batches.
    """
    img01 = image_u8.astype(jnp.float32) / 255.0
    towers = [_transform_one_tower(img01, spec, config.strategy) for spec in config.towers]
    # HWC -> CHW, then stack along channels.
    chw = [jnp.transpose(t, (2, 0, 1)) for t in towers]
    return jnp.concatenate(chw, axis=0).astype(dtype)


def preprocess_batch(
    images_u8: jnp.ndarray,
    config: ImageTransformConfig,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> [B, num_towers*3, size, size]."""
    return jax.vmap(lambda im: preprocess_image(im, config, dtype))(images_u8)


def transform_config_for_backbone(vision_backbone_id: str, image_resize_strategy: str) -> ImageTransformConfig:
    """Map a registered vision backbone id to its transform config
    (resolutions/normalizations per reference configuration_prismatic.py:15-46)."""
    table: Dict[str, Tuple[ImageTowerSpec, ...]] = {
        "clip-vit-l": (TOWER_SPECS["clip"],),
        "clip-vit-l-336px": (TOWER_SPECS["clip-336"],),
        "siglip-vit-so400m": (TOWER_SPECS["siglip"],),
        "siglip-vit-so400m-384px": (TOWER_SPECS["siglip-384"],),
        "dinov2-vit-l": (TOWER_SPECS["dinov2"],),
        "in1k-vit-l": (TOWER_SPECS["in1k"],),
        # Base-size ablation towers (reference materialize.py:38-44)
        "clip-vit-b": (TOWER_SPECS["clip"],),
        "siglip-vit-b16-224px": (TOWER_SPECS["siglip"],),
        "siglip-vit-b16-256px": (dataclasses.replace(TOWER_SPECS["siglip"], size=256),),
        "siglip-vit-b16-384px": (TOWER_SPECS["siglip-384"],),
        "dinoclip-vit-l-336px": (
            dataclasses.replace(TOWER_SPECS["dinov2"], size=336),
            TOWER_SPECS["clip-336"],
        ),
        "dinosiglip-vit-so-224px": (TOWER_SPECS["dinov2"], TOWER_SPECS["siglip"]),
        "dinosiglip-vit-so-384px": (
            dataclasses.replace(TOWER_SPECS["dinov2"], size=384),
            TOWER_SPECS["siglip-384"],
        ),
    }
    if vision_backbone_id not in table:
        raise KeyError(f"Unknown vision backbone {vision_backbone_id!r}")
    return ImageTransformConfig(strategy=image_resize_strategy, towers=table[vision_backbone_id])


def crop_and_resize_eval(image01: jnp.ndarray, crop_scale: float = 0.9) -> jnp.ndarray:
    """Center crop to sqrt(crop_scale) of each side + resize back — the
    eval-time transform matching train-time random_resized_crop statistics
    (reference: experiments/robot/openvla_utils.py:81-124, which warns that
    LIBERO models *must* see this crop at inference)."""
    h, w = image01.shape[0], image01.shape[1]
    ratio = float(np.sqrt(crop_scale))
    ch, cw = int(round(h * ratio)), int(round(w * ratio))
    cropped = center_crop(image01, (ch, cw))
    return resize(cropped, (h, w), "bicubic")
