"""Pretrained-ViT partial load: parity against the ACTUAL reference ViT.

Imports ``/root/reference/vit_model.py`` itself (pure torch, no timm),
moves a randomly initialized reference VisionTransformer's state_dict into
our flax model via ``compat.vit_import.load_torch_vit``, and asserts
forward parity — the same weight-porting contract the reference applies to
google-research ``.pth`` files (``vit_model.py:664-707``).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(_REF, "vit_model.py")),
    reason="reference tree absent",
)
if _REF not in sys.path:
    sys.path.insert(0, _REF)


def _tiny_ref_vit():
    import vit_model as ref

    torch.manual_seed(0)
    m = ref.VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        representation_size=64, num_classes=10,
    )
    m.eval()
    return m


def test_vit_state_dict_partial_load_and_forward_parity():
    import jax
    import jax.numpy as jnp

    from deepmerge_tpu.compat.vit_import import load_torch_vit
    from deepmerge_tpu.models.vit import VisionTransformer

    ref = _tiny_ref_vit()
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        representation_size=64, num_classes=10, exact_gelu=True,
    )
    r = np.random.RandomState(0)
    x = r.rand(3, 32, 32, 3).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), False)

    params, report = load_torch_vit(
        variables["params"], ref.state_dict(), has_logits=True,
        drop_head=False,
    )
    assert not report["missing"], report["missing"]
    assert not report["skipped"], report["skipped"]

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), False))
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vit_partial_load_drops_head_keys():
    """has_logits=True deletes head.* before loading (vit_model.py:696-699);
    the flax head keeps its init and everything else is overwritten."""
    import jax
    import jax.numpy as jnp

    from deepmerge_tpu.compat.vit_import import load_torch_vit
    from deepmerge_tpu.models.vit import VisionTransformer

    ref = _tiny_ref_vit()
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4,
        representation_size=64, num_classes=10,
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(1), x, False)
    before_head = np.asarray(variables["params"]["head"]["kernel"]).copy()
    before_block = np.asarray(
        variables["params"]["block0"]["attn"]["qkv"]["kernel"]
    ).copy()

    params, report = load_torch_vit(
        variables["params"], ref.state_dict(), has_logits=True,
    )
    np.testing.assert_array_equal(params["head"]["kernel"], before_head)
    assert set(report["missing"]) == {"head.kernel", "head.bias"}
    assert not np.array_equal(
        params["block0"]["attn"]["qkv"]["kernel"], before_block
    )
    # the qkv weight landed transposed (torch (out,in) -> flax (in,out))
    np.testing.assert_allclose(
        np.asarray(params["block0"]["attn"]["qkv"]["kernel"]),
        ref.state_dict()["blocks.0.attn.qkv.weight"].numpy().T,
    )


def test_scale_embed_partial_load_from_plain_vit():
    """The reference's documented flow (vit_model.py:687-701): load a PLAIN
    ViT checkpoint into ScaleEmbedTransformer with the no-logits del-keys;
    blocks/norm/cls load, plain pos_embed has no home and is skipped."""
    import jax
    import jax.numpy as jnp

    from deepmerge_tpu.compat.vit_import import load_torch_vit
    from deepmerge_tpu.models.vit import ScaleEmbedTransformer

    ref = _tiny_ref_vit()
    model = ScaleEmbedTransformer(
        num_classes=11, embed_dim=64, depth=2, num_heads=4,
        feature_embed=False,
    )
    patches = tuple(
        jnp.zeros((1, s, s, 3), jnp.float32) for s in model.IMG_SIZES
    )
    variables = model.init(jax.random.key(2), patches, None, None, False)
    params, report = load_torch_vit(
        variables["params"], ref.state_dict(), has_logits=False,
    )
    assert any(k.startswith("block0.") for k in report["loaded"])
    assert "cls_token" in report["loaded"]
    # plain-ViT keys with no home in the multi-scale model are skipped,
    # exactly like torch strict=False "unexpected keys"
    assert any(k.startswith("pos_embed") for k in report["skipped"])
    # per-scale embeds keep their init (reference trains them from scratch)
    assert any(k.startswith("patch_embed0") for k in report["missing"])


def test_factories_match_reference_configs():
    from deepmerge_tpu.models import vit as m

    assert m.vit_base_patch16_224_in21k().embed_dim == 768
    assert m.vit_base_patch16_224_in21k(has_logits=False).representation_size is None
    assert m.vit_large_patch32_224_in21k().depth == 24
    assert m.vit_huge_patch14_224_in21k().patch_size == 14
    s = m.vit_base_patch_scales_224_in21k(num_classes=512, has_logits=False,
                                          is_feature_embed=False)
    assert s.depth == 12 and not s.feature_embed
