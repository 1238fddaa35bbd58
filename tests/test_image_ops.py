"""Image preprocessing parity tests.

Ground truth is PIL bicubic resize (what torchvision uses on PIL inputs in the
reference processor, processing_prismatic.py:137-141). We bound pixel drift of
the jitted XLA path against it — exact equality is impossible across resize
implementations; the budget (<2/255 mean, <0.1 max on [0,1] scale) is far
below the ViT feature-drift threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from bridgelang_tpu.ops.image_ops import (
    ImageTransformConfig,
    TOWER_SPECS,
    center_crop,
    crop_and_resize_eval,
    letterbox_pad,
    normalize,
    preprocess_batch,
    preprocess_image,
    resize,
    transform_config_for_backbone,
)


@pytest.fixture(scope="module")
def photo():
    rng = np.random.default_rng(0)
    # Smooth-ish synthetic image: random low-freq field upsampled (more like a photo
    # than white noise, which over-penalizes antialias kernel differences).
    small = rng.uniform(0, 255, size=(24, 32, 3))
    img = np.asarray(Image.fromarray(small.astype(np.uint8)).resize((640, 480), Image.BILINEAR))
    return img.astype(np.uint8)


def pil_resize01(img_u8, size_hw):
    pil = Image.fromarray(img_u8).resize((size_hw[1], size_hw[0]), Image.BICUBIC)
    return np.asarray(pil).astype(np.float32) / 255.0


def test_resize_matches_pil_bicubic(photo):
    ours = np.asarray(resize(jnp.asarray(photo, dtype=jnp.float32) / 255.0, (224, 224)))
    ref = pil_resize01(photo, (224, 224))
    assert np.abs(ours - ref).mean() < 2 / 255
    assert np.abs(ours - ref).max() < 0.1


def test_center_crop_matches_torchvision_semantics(photo):
    img = jnp.asarray(photo, dtype=jnp.float32)
    out = np.asarray(center_crop(img, (224, 224)))
    top, left = int(round((480 - 224) / 2)), int(round((640 - 224) / 2))
    np.testing.assert_array_equal(out, photo[top : top + 224, left : left + 224].astype(np.float32))


def test_letterbox_pads_to_square_with_fill(photo):
    img01 = jnp.asarray(photo, dtype=jnp.float32) / 255.0
    fill = (0.485, 0.456, 0.406)
    out = np.asarray(letterbox_pad(img01, fill))
    assert out.shape == (640, 640, 3)  # int((640-480)/2)=80 per side
    np.testing.assert_allclose(out[0, 0], fill, rtol=1e-6)  # corner is fill
    np.testing.assert_allclose(out[80:560, :, :], np.asarray(img01), rtol=1e-6)


def test_normalize():
    img = jnp.ones((4, 4, 3)) * 0.5
    out = np.asarray(normalize(img, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_dinosiglip_stack_layout(photo):
    cfg = transform_config_for_backbone("dinosiglip-vit-so-224px", "resize-naive")
    out = np.asarray(preprocess_image(jnp.asarray(photo), cfg))
    assert out.shape == (6, 224, 224)
    # First 3 channels = DINOv2 (imagenet norm), last 3 = SigLIP ([-1,1] norm)
    ref = pil_resize01(photo, (224, 224))
    dino_ref = (ref - np.array(TOWER_SPECS["dinov2"].mean)) / np.array(TOWER_SPECS["dinov2"].std)
    sig_ref = (ref - 0.5) / 0.5
    assert np.abs(out[:3].transpose(1, 2, 0) - dino_ref).mean() < 0.05
    assert np.abs(out[3:].transpose(1, 2, 0) - sig_ref).mean() < 0.05
    # SigLIP output bounded in [-1, 1] (+resize ringing slack)
    assert out[3:].min() > -1.2 and out[3:].max() < 1.2


def test_preprocess_is_jittable_and_batched(photo):
    cfg = transform_config_for_backbone("dinosiglip-vit-so-224px", "resize-naive")
    jitted = jax.jit(lambda im: preprocess_image(im, cfg))
    single = jitted(jnp.asarray(photo))
    batch = preprocess_batch(jnp.stack([jnp.asarray(photo)] * 3), cfg)
    assert batch.shape == (3, 6, 224, 224)
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(single), atol=1e-5)


def test_letterbox_strategy_end_to_end(photo):
    cfg = transform_config_for_backbone("clip-vit-l-336px", "letterbox")
    out = np.asarray(preprocess_image(jnp.asarray(photo), cfg))
    assert out.shape == (3, 336, 336)


def test_resize_crop_strategy(photo):
    cfg = transform_config_for_backbone("siglip-vit-so400m", "resize-crop")
    out = np.asarray(preprocess_image(jnp.asarray(photo), cfg))
    assert out.shape == (3, 224, 224)


def test_eval_center_crop_roundtrip(photo):
    img01 = jnp.asarray(photo, dtype=jnp.float32) / 255.0
    out = np.asarray(crop_and_resize_eval(img01, 0.9))
    assert out.shape == img01.shape
    # Cropping 90% area then resizing back keeps the center region similar
    c = np.asarray(img01[200:280, 280:360])
    oc = out[200:280, 280:360]
    assert np.abs(oc - c).mean() < 0.12
