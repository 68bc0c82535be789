"""flax → reference-loadable .pth round trip (VERDICT r2 item 7).

The exported checkpoint loads into the ACTUAL reference net with strict
``load_state_dict`` (the reference's own consumption path,
``ExtractFeatures.py:35-36``), and the torch forward reproduces the flax
embeddings — so a TPU-trained model can be independently verified by the
reference code base.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepmerge_tpu.compat.torch_export import (
    flax_to_torch_state_dict,
    save_torch_checkpoint,
)
from deepmerge_tpu.config import ModelConfig
from deepmerge_tpu.models.s2former import build_model, init_params

try:
    import torch

    from tests.timm_shim import import_reference

    SSF, _ = import_reference()
    _HAVE_REF = True
except ImportError:  # pragma: no cover
    _HAVE_REF = False

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference tree / torch unavailable"
)


def _ref_net(variant: str, mcfg: ModelConfig):
    kw = dict(
        input_image_scales=list(mcfg.input_image_scales),
        cube_size=[mcfg.cube, mcfg.cube],
        embed_dim=mcfg.embed_dim,
        num_heads=mcfg.num_heads,
    )
    if variant != "v5":  # v5 has no is_designed flag (always on, :1264-1285)
        kw["is_designed_feature_embedding"] = True
    cls = {
        "v3": SSF.ShfitScaleFormer_v3,
        "v4": SSF.ShfitScaleFormer_v4,
        "v5": SSF.ShfitScaleFormer_v5,
    }[variant]
    return cls(depth=list(mcfg.depth), **kw)


@pytest.mark.parametrize("variant", ["v3", "v4", "v5"])
def test_export_roundtrip_embeddings_match(variant, tmp_path):
    # embed_dim must be 768: the reference's PatchEmbed/FeatureEmbed
    # hardcode it internally (same constraint as the forward parity tests)
    mcfg = ModelConfig(
        variant=variant, input_image_scales=(16, 32, 64), cube=8,
        embed_dim=768, depth=(2, 1, 1), num_heads=12, out_dim=100,
        num_classes=11, dtype="float32", exact_gelu=True,
        fused_attention=False, fused_block=False,
    )
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0))

    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(variables, mcfg, path, epoch=7)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7
    assert ckpt["scales"] == list(mcfg.input_image_scales)
    assert ckpt["depth"] == list(mcfg.depth)

    net = _ref_net(variant, mcfg)
    # STRICT load — every reference key must be present with the right shape
    net.load_state_dict(ckpt["net"])
    net.eval()

    r = np.random.RandomState(0)
    patches_np = [r.rand(2, 3, s, s).astype(np.float32)
                  for s in mcfg.input_image_scales]
    designed_np = r.rand(2, 19).astype(np.float32)

    with torch.no_grad():
        ref_out = net(
            [torch.from_numpy(x) for x in patches_np],
            torch.from_numpy(designed_np)[:, None, :],  # ref: (B, 1, 19)
        ).numpy()

    ours = np.asarray(model.apply(
        variables,
        tuple(jnp.asarray(x.transpose(0, 2, 3, 1)) for x in patches_np),
        jnp.asarray(designed_np), False,
    ))
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_export_import_roundtrip_identity(tmp_path):
    """export → torch_import re-import reproduces the original variables."""
    from deepmerge_tpu.compat.torch_import import load_torch_checkpoint
    from deepmerge_tpu.config import Config

    mcfg = ModelConfig(
        variant="v3", input_image_scales=(16, 32, 64), cube=8,
        embed_dim=48, depth=(2, 1, 1), num_heads=4, out_dim=100,
        dtype="float32",
    )
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(1))
    path = str(tmp_path / "rt.pth")
    save_torch_checkpoint(variables, mcfg, path)

    back = load_torch_checkpoint(path, Config(model=mcfg))
    want = jax.tree_util.tree_leaves_with_path(variables["params"])
    got_tree = back["params"]
    for kp, leaf in want:
        node = got_tree
        for k in kp:
            node = node[k.key]
        np.testing.assert_allclose(
            np.asarray(node), np.asarray(leaf), rtol=1e-6, atol=1e-6,
            err_msg=str(kp),
        )


def test_export_v6_no_classes_strict_load():
    """v6 with num_classes=0: the reference builds head = nn.Identity()
    (ShfitScaleFormer.py:1527), so the export must NOT emit head.* keys —
    strict load_state_dict would reject them."""
    mcfg = ModelConfig(
        variant="v6", input_image_scales=(16, 32, 64), cube=8,
        embed_dim=768, num_heads=12, depth=(1, 1, 1), out_dim=100,
        num_classes=0, dtype="float32",
    )
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(0), batch=2)
    sd = flax_to_torch_state_dict(variables, mcfg)
    assert not any(k.startswith("head.") for k in sd)

    net = SSF.ShfitScaleFormer_v6(num_classes=0, embed_dim=768, cuda=False)
    net.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )


def test_import_v5_prunes_dead_aux_norm_subtree(tmp_path):
    """A reference v5 checkpoint carries aux0/aux1 ``norm`` weights the
    forward never applies (AuxBolck_v5 creates-but-skips its norm); the
    import must drop the whole dead subtree so the params tree STRUCTURE
    matches init_params (optax/jax.tree.map compatibility)."""
    from deepmerge_tpu.compat.torch_import import load_torch_checkpoint
    from deepmerge_tpu.config import Config

    mcfg = ModelConfig(
        variant="v5", input_image_scales=(16, 32, 64), cube=8,
        embed_dim=48, depth=(2, 1, 1), num_heads=4, out_dim=100,
        dtype="float32",
    )
    model = build_model(mcfg)
    variables = init_params(model, jax.random.key(2), batch=2)
    sd = flax_to_torch_state_dict(variables, mcfg)
    for aux in ("aux0", "aux1"):
        sd[f"{aux}.norm.weight"] = torch.ones(mcfg.embed_dim)
        sd[f"{aux}.norm.bias"] = torch.zeros(mcfg.embed_dim)
    path = str(tmp_path / "v5_deadnorm.pth")
    torch.save({"net": sd, "epoch": 99}, path)

    back = load_torch_checkpoint(path, Config(model=mcfg))
    assert jax.tree_util.tree_structure(back["params"]) == (
        jax.tree_util.tree_structure(variables["params"])
    )
