"""Frame-level (observation) transforms: decode, resize, augment.

Counterpart of reference prismatic/vla/datasets/rlds/obs_transforms.py:17-99.
Runs per-frame inside tf.data on host CPU.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple, Union

import tensorflow as tf

AUGMENT_OPS = {
    "random_resized_crop": "random_resized_crop",
    "random_brightness": "random_brightness",
    "random_contrast": "random_contrast",
    "random_saturation": "random_saturation",
    "random_hue": "random_hue",
}


def _augment_image(image: tf.Tensor, seed: tf.Tensor, **kwargs: Any) -> tf.Tensor:
    """Seeded augmentations in the order given by augment_order
    (matches the reference's dlimp-style aug kwargs, rlds/dataset.py:121-136)."""
    image = tf.cast(image, tf.float32) / 255.0 if image.dtype == tf.uint8 else image
    seed2 = tf.stack([seed, seed + 1])
    for op in kwargs.get("augment_order", []):
        if op == "random_resized_crop":
            rrc = kwargs["random_resized_crop"]
            scale = rrc.get("scale", [0.9, 0.9])
            ratio = rrc.get("ratio", [1.0, 1.0])
            shape = tf.shape(image)
            h, w = tf.cast(shape[0], tf.float32), tf.cast(shape[1], tf.float32)
            area = tf.random.stateless_uniform([], seed2, scale[0], scale[1]) * h * w
            aspect = tf.random.stateless_uniform([], seed2 + 1, ratio[0], ratio[1])
            ch = tf.cast(tf.round(tf.sqrt(area / aspect)), tf.int32)
            cw = tf.cast(tf.round(tf.sqrt(area * aspect)), tf.int32)
            ch = tf.minimum(ch, shape[0])
            cw = tf.minimum(cw, shape[1])
            image = tf.image.stateless_random_crop(image, [ch, cw, 3], seed=seed2 + 2)
            image = tf.image.resize(image, (shape[0], shape[1]), method="bilinear")
        elif op == "random_brightness":
            image = tf.image.stateless_random_brightness(image, kwargs["random_brightness"][0], seed2 + 3)
        elif op == "random_contrast":
            lo, hi = kwargs["random_contrast"]
            image = tf.image.stateless_random_contrast(image, lo, hi, seed2 + 4)
        elif op == "random_saturation":
            lo, hi = kwargs["random_saturation"]
            image = tf.image.stateless_random_saturation(image, lo, hi, seed2 + 5)
        elif op == "random_hue":
            image = tf.image.stateless_random_hue(image, kwargs["random_hue"][0], seed2 + 6)
        else:
            raise ValueError(f"Unknown augmentation op {op!r}")
    image = tf.clip_by_value(image, 0.0, 1.0)
    return tf.cast(image * 255.0, tf.uint8)


def augment(obs: Dict[str, Any], seed: tf.Tensor, augment_kwargs: Union[Mapping, Dict[str, Mapping]]) -> Dict[str, Any]:
    """Augment all image_* keys (per-name kwargs allowed; reference
    obs_transforms.py:17-49)."""
    image_names = {k[len("image_"):] for k in obs if k.startswith("image_")}
    if not isinstance(augment_kwargs, Mapping) or (augment_kwargs and "augment_order" not in augment_kwargs):
        per_name = dict(augment_kwargs)
    else:
        per_name = {name: augment_kwargs for name in image_names}
    for i, name in enumerate(sorted(image_names)):
        if name not in per_name:
            continue
        key = f"image_{name}"
        obs[key] = _augment_image(obs[key], seed + i, **per_name[name])
    return obs


def decode_and_resize(
    obs: Dict[str, Any],
    resize_size: Union[Optional[Tuple[int, int]], Dict[str, Tuple[int, int]]],
    depth_resize_size: Union[Optional[Tuple[int, int]], Dict[str, Tuple[int, int]]] = None,
) -> Dict[str, Any]:
    """JPEG-decode string image features; synthesize zero padding images for
    empty strings; resize (reference obs_transforms.py:52-99)."""
    image_names = {k[len("image_"):] for k in obs if k.startswith("image_")}
    depth_names = {k[len("depth_"):] for k in obs if k.startswith("depth_")}
    if isinstance(resize_size, tuple) or resize_size is None:
        resize_size = {name: resize_size for name in image_names}
    if isinstance(depth_resize_size, tuple) or depth_resize_size is None:
        depth_resize_size = {name: depth_resize_size for name in depth_names}

    for name in image_names:
        key = f"image_{name}"
        image = obs[key]
        size = resize_size.get(name)
        if image.dtype == tf.string:
            if tf.strings.length(image) == 0:
                target = size or (1, 1)
                image = tf.zeros((*target, 3), dtype=tf.uint8)
            else:
                image = tf.io.decode_image(image, expand_animations=False, dtype=tf.uint8)
        elif image.dtype != tf.uint8:
            raise ValueError(f"Unsupported image dtype {image.dtype} for {key}")
        if size is not None:
            image = tf.cast(tf.round(tf.image.resize(tf.cast(image, tf.float32), size, method="lanczos3")), tf.uint8)
        obs[key] = image

    for name in depth_names:
        key = f"depth_{name}"
        depth = obs[key]
        size = depth_resize_size.get(name)
        if depth.dtype == tf.string:
            if tf.strings.length(depth) == 0:
                target = size or (1, 1)
                depth = tf.zeros((*target, 1), dtype=tf.float32)
            else:
                depth = tf.io.decode_image(depth, expand_animations=False, dtype=tf.float32)[..., 0]
        if size is not None:
            depth = tf.image.resize(depth[..., None], size, method="bilinear")[..., 0]
        obs[key] = depth
    return obs
