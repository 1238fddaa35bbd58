"""Vision-tower parity vs HF transformers (the independent implementation).

The reference inherits DINOv2/SigLIP correctness from timm
(base_vision.py:110-128); our towers are re-implemented, so this is the
load-bearing fidelity check: convert HF weights -> our pytree and assert the
second-to-last-block patch features match, separately for

  * DINOv2 (register tokens, LayerScale, no_embed_class / CLS-pos folding)
  * SigLIP  (no CLS, tanh-approx GELU)

A silent mismatch here corrupts every downstream number while all other
tests stay green (VERDICT round 1, Missing #2).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridgelang_tpu.models.vision.hf_convert import convert_hf_dinov2, convert_hf_siglip  # noqa: E402
from bridgelang_tpu.models.vision.vit import ViT, ViTConfig  # noqa: E402

DEPTH = 5  # small but deep enough that drift compounds if anything is off


def _pixels(b=2, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, 3, size, size)).astype(np.float32)


def _run_ours(cfg, params, pixels):
    model = ViT(cfg, dtype=jnp.float32)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    return np.asarray(model.apply({"params": params}, jnp.asarray(pixels)))


def test_dinov2_parity_with_hf():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=DEPTH, num_attention_heads=4, mlp_ratio=4,
        image_size=32, patch_size=8, num_register_tokens=4, layerscale_value=1e-5,
        hidden_act="gelu", layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    hf = Dinov2WithRegistersModel(hf_cfg).eval()
    # non-trivial layerscale so the branches actually contribute
    with torch.no_grad():
        for layer in hf.encoder.layer:
            layer.layer_scale1.lambda1.uniform_(0.5, 1.5)
            layer.layer_scale2.lambda1.uniform_(0.5, 1.5)

    cfg = ViTConfig(image_size=32, patch_size=8, width=32, depth=DEPTH, num_heads=4, mlp_dim=128,
                    use_cls_token=True, num_reg_tokens=4, no_embed_class=True, layerscale_init=1e-5)
    params = convert_hf_dinov2(hf.state_dict(), cfg)

    pixels = _pixels()
    ours = _run_ours(cfg, params, pixels)

    with torch.no_grad():
        out = hf(torch.from_numpy(pixels), output_hidden_states=True)
    # hidden_states[0] = embeddings, [i+1] = block i -> second-to-last block
    # output is hidden_states[DEPTH - 1]; strip [cls] + 4 register tokens.
    theirs = out.hidden_states[DEPTH - 1][:, 1 + 4 :].numpy()

    assert ours.shape == theirs.shape == (2, 16, 32)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)


def test_dinov2_cls_pos_folding_is_loadbearing():
    """Dropping the CLS-position fold must change the features — guards
    against the fold silently becoming a no-op."""
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=DEPTH, num_attention_heads=4, mlp_ratio=4,
        image_size=32, patch_size=8, num_register_tokens=4, layerscale_value=1.0,
    )
    torch.manual_seed(1)
    hf = Dinov2WithRegistersModel(hf_cfg).eval()
    cfg = ViTConfig(image_size=32, patch_size=8, width=32, depth=DEPTH, num_heads=4, mlp_dim=128,
                    use_cls_token=True, num_reg_tokens=4, no_embed_class=True, layerscale_init=1e-5)
    params = convert_hf_dinov2(hf.state_dict(), cfg)
    bad = dict(params, cls_token=np.asarray(hf.state_dict()["embeddings.cls_token"]))
    pixels = _pixels(seed=1)
    assert not np.allclose(_run_ours(cfg, params, pixels), _run_ours(cfg, bad, pixels))


def test_siglip_parity_with_hf():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=48, num_hidden_layers=DEPTH, num_attention_heads=4, intermediate_size=96,
        image_size=32, patch_size=8, hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()

    cfg = ViTConfig(image_size=32, patch_size=8, width=48, depth=DEPTH, num_heads=4, mlp_dim=96,
                    use_cls_token=False, act="gelu_tanh")
    params = convert_hf_siglip(hf.state_dict(), cfg)

    pixels = _pixels(seed=2)
    ours = _run_ours(cfg, params, pixels)
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels), output_hidden_states=True)
    theirs = out.hidden_states[DEPTH - 1].numpy()

    assert ours.shape == theirs.shape == (2, 16, 48)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=2e-5)


def test_siglip_act_is_tanh_approx():
    """The registered SigLIP configs must use tanh-approx GELU (big_vision /
    HF semantics); exact GELU silently drifts every feature."""
    from bridgelang_tpu.models.vision.vit import VIT_CONFIGS

    assert VIT_CONFIGS["siglip-vit-so400m"].act == "gelu_tanh"
    assert VIT_CONFIGS["siglip-vit-so400m-384px"].act == "gelu_tanh"


def test_converter_resamples_pos_embed_grid():
    """Checkpoints ship their native resolution (facebook/dinov2-* is 518px);
    converting to a different target resolution must bicubic-resample the
    patch-grid positional embedding like timm does at create time."""
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4, mlp_ratio=4,
        image_size=48, patch_size=8, num_register_tokens=4, layerscale_value=1e-5,
    )
    torch.manual_seed(3)
    hf = Dinov2WithRegistersModel(hf_cfg).eval()  # 6x6 = 36 patch positions

    cfg = ViTConfig(image_size=32, patch_size=8, width=32, depth=3, num_heads=4, mlp_dim=128,
                    use_cls_token=True, num_reg_tokens=4, no_embed_class=True, layerscale_init=1e-5)
    params = convert_hf_dinov2(hf.state_dict(), cfg)  # 4x4 = 16 target positions
    assert params["pos_embed"].shape == (1, 16, 32)
    out = _run_ours(cfg, params, _pixels(b=1, size=32, seed=5))
    assert out.shape == (1, 16, 32) and np.isfinite(out).all()
