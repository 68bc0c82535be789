"""variant="vit": the ScaleEmbedTransformer as a pipeline backbone.

The reference imported vit_model into the trainer but never ran it
(``Train_SMT.py:26`` — commented out of ``main()``); here the adapter
(`models/vit.ScaleEmbedBackbone`) makes it a first-class backbone for the
same extract → score → merge pipeline the S2Former family drives.
"""

import jax
import numpy as np
import pytest

from deepmerge_tpu.config import Config, DataConfig, ModelConfig
from deepmerge_tpu.geodata.synthetic import generate_scene
from deepmerge_tpu.models.s2former import build_model, init_params


@pytest.fixture(scope="module")
def vit_cfg() -> ModelConfig:
    return ModelConfig(
        variant="vit",
        input_image_scales=(28, 56, 112, 224),
        embed_dim=32,
        depth=(2,),
        num_heads=4,
        out_dim=16,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def vit_data_cfg() -> DataConfig:
    return DataConfig(
        patch_sizes=(28, 56, 112, 224), factor_slots=4, max_window=256,
        batch_size=4, eval_batch_size=8,
    )


def test_vit_variant_requires_fixed_scales():
    with pytest.raises(ValueError, match="28,56,112"):
        build_model(ModelConfig(variant="vit",
                                input_image_scales=(32, 64, 128)))


def test_adapter_slices_factors_from_designed(vit_cfg):
    """Adapter == calling ScaleEmbedTransformer directly with
    factors = designed[:, -4:] (MyUtils1.py:151-156 designed-vector
    contract)."""
    from deepmerge_tpu.models.vit import ScaleEmbedTransformer

    model = build_model(vit_cfg)
    variables = init_params(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    patches = tuple(
        rng.random((3, s, s, 3), np.float32)
        for s in vit_cfg.input_image_scales
    )
    designed = rng.random((3, 19), np.float32)

    out = model.apply(variables, patches, designed, False)
    direct = ScaleEmbedTransformer(
        num_classes=vit_cfg.num_classes, embed_dim=vit_cfg.embed_dim,
        depth=sum(vit_cfg.depth), num_heads=vit_cfg.num_heads,
        mlp_ratio=vit_cfg.mlp_ratio, out_dim=vit_cfg.out_dim,
        feature_embed=True, dtype=np.float32,
    ).apply({"params": variables["params"]["vit"]}, patches, designed,
            designed[:, -4:], False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)
    assert vit_cfg.name.startswith("ScaleEmbedViT-4CH")


def test_vit_variant_extract_and_merge(vit_cfg, vit_data_cfg):
    """The full driver pipeline runs with the vit backbone."""
    from deepmerge_tpu.infer.driver import process_scene

    scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3, seed=31)
    cfg = Config(model=vit_cfg, data=vit_data_cfg)
    model = build_model(vit_cfg)
    params = init_params(model, jax.random.key(1))["params"]
    emb, simi, result = process_scene(cfg, scene, model, params, None,
                                      log_fn=lambda *_: None)
    assert emb.shape == (scene.regions.num_points, vit_cfg.out_dim)
    assert np.isfinite(emb).all()
    assert simi.shape == (scene.rag.num_edges,)
    assert result is not None
    assert 1 <= result.num_clusters <= scene.regions.num_regions


def test_vit_variant_train_step(vit_cfg, vit_data_cfg):
    """One Siamese contrastive train step on the vit backbone."""
    from deepmerge_tpu.geodata.synthetic import make_training_pairs
    from deepmerge_tpu.train.loop import create_train_state, make_train_step
    from deepmerge_tpu.train.sampler import PairSampler

    scene = generate_scene(h=96, w=96, n_regions=10, n_objects=3, seed=32)
    cfg = Config(model=vit_cfg, data=vit_data_cfg)
    model = build_model(vit_cfg)
    state = create_train_state(model, cfg, jax.random.key(0),
                               steps_per_epoch=1)
    step = make_train_step(model, cfg)
    pos, neg = make_training_pairs(scene)
    sampler = PairSampler(scene, pos, neg, vit_data_cfg)
    batch = next(iter(sampler.epoch_batches(epoch_seed=0, batch_size=4)))
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
