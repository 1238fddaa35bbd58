"""ViT backbone tests (tiny configs; semantics of the Prismatic feature tap)."""

import jax
import jax.numpy as jnp
import numpy as np

from bridgelang_tpu.models.vision.vit import FusedViT, VIT_CONFIGS, ViT, build_vision_backbone
from tests.helpers import TINY_VIT, TINY_VIT_B


def test_vit_output_shape_strips_prefix_tokens():
    model = ViT(TINY_VIT)
    x = jnp.zeros((2, 3, 32, 32))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    # 32/8 = 4 -> 16 patches; cls+2 reg prefix tokens stripped
    assert out.shape == (2, 16, 32)


def test_vit_runs_depth_minus_two_blocks():
    model = ViT(TINY_VIT)
    x = jnp.ones((1, 3, 32, 32))
    params = model.init(jax.random.key(0), x)["params"]
    # Scanned blocks params must be stacked with leading dim depth-1 (blocks 0..depth-2)
    stacked = jax.tree_util.tree_leaves(params["blocks"])[0]
    assert stacked.shape[0] == TINY_VIT.depth - 1
    # A shallower tap = same module with fewer blocks + sliced stacked params
    shallow = ViT(TINY_VIT, n_blocks=1)
    params_shallow = dict(params, blocks=jax.tree.map(lambda p: p[:1], params["blocks"]))
    out_full = model.apply({"params": params}, x)
    out_shallow = shallow.apply({"params": params_shallow}, x)
    assert out_full.shape == out_shallow.shape
    assert not np.allclose(np.asarray(out_full), np.asarray(out_shallow))


def test_fused_vit_concats_embed_dims():
    model = FusedViT(TINY_VIT, TINY_VIT_B)
    x = jnp.zeros((2, 6, 32, 32))
    params = model.init(jax.random.key(0), x)["params"]
    assert "featurizer" in params and "fused_featurizer" in params
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, 32 + 48)


def test_fused_towers_see_their_own_channels():
    model = FusedViT(TINY_VIT, TINY_VIT_B)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(1, 6, 32, 32)), dtype=jnp.float32)
    params = model.init(jax.random.key(0), base)["params"]
    out0 = model.apply({"params": params}, base)
    # Perturb only the second tower's channels: first tower's features unchanged.
    perturbed = base.at[:, 3:].add(1.0)
    out1 = model.apply({"params": params}, perturbed)
    np.testing.assert_allclose(np.asarray(out0[..., :32]), np.asarray(out1[..., :32]), atol=1e-5)
    assert not np.allclose(np.asarray(out0[..., 32:]), np.asarray(out1[..., 32:]))


def test_registry_configs_match_published_dims():
    # vit_large_patch14_reg4_dinov2: 1024x24, 4 reg tokens, layerscale
    d = VIT_CONFIGS["dinov2-vit-l"]
    assert (d.width, d.depth, d.num_reg_tokens, d.layerscale_init) == (1024, 24, 4, 1e-5)
    assert d.num_patches == 256
    # vit_so400m_patch14_siglip_224: 1152x27, no cls token
    s = VIT_CONFIGS["siglip-vit-so400m"]
    assert (s.width, s.depth, s.use_cls_token, s.mlp_dim) == (1152, 27, False, 4304)
    assert s.num_patches == 256


def test_build_vision_backbone_fused():
    module, dim, patches = build_vision_backbone("dinosiglip-vit-so-224px")
    assert dim == 1024 + 1152 and patches == 256


def test_vision_registry_parity_with_reference():
    """The id set must cover the reference's VISION_BACKBONES registry exactly
    (reference materialize.py:29-53: 11 single + 2 fused = 13 ids), and every
    id must resolve to a module + transform config and abstractly initialize
    with consistent shapes."""
    import jax

    from bridgelang_tpu.models.vision.vit import FUSED_BACKBONES
    from bridgelang_tpu.ops.image_ops import transform_config_for_backbone

    reference_ids = {
        "clip-vit-l", "siglip-vit-so400m", "dinov2-vit-l", "in1k-vit-l",
        "dinosiglip-vit-so-224px",
        "clip-vit-b", "clip-vit-l-336px",
        "siglip-vit-b16-224px", "siglip-vit-b16-256px", "siglip-vit-b16-384px",
        "siglip-vit-so400m-384px",
        "dinoclip-vit-l-336px", "dinosiglip-vit-so-384px",
    }
    assert set(VIT_CONFIGS) | set(FUSED_BACKBONES) == reference_ids

    for backbone_id in sorted(reference_ids):
        module, dim, patches = build_vision_backbone(backbone_id)
        tc = transform_config_for_backbone(backbone_id, "resize-naive")
        size = tc.towers[0].size
        assert all(t.size == size for t in tc.towers)
        dummy = jnp.zeros((1, 3 * tc.num_towers, size, size), jnp.float32)
        # Abstract init: validates param/output shapes without running compute
        # (full-size towers would take minutes each on this 1-core box).
        variables = jax.eval_shape(module.init, jax.random.key(0), dummy)
        out = jax.eval_shape(
            lambda v, x: module.apply(v, x), variables, dummy)
        assert out.shape == (1, patches, dim)
