"""w8a8 quantized megakernel: kernel parity, model closeness, merge parity.

The quantized path runs the megakernel's qkv/proj/mlp GEMMs as int8 MXU
dots (per-output-channel weight scales + dynamic per-row activation
quantization; attention inner loop stays in the compute dtype). Measured
26.1 vs 37.5 ms/block at the stage-0 operating point on v5e (BENCH.md
round-3). The reference has no quantized path — this is a deployment
surface of the new framework, gated on the same ≤0.5% partition-parity
budget as every other non-bit-exact speed knob (BASELINE.md north star).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmerge_tpu.config import ModelConfig
from deepmerge_tpu.models.s2former import build_model, init_params
from deepmerge_tpu.ops.pallas.fused_block import (
    _block_math_q8,
    _xla_block,
    fused_block,
    fused_block_chain,
    quantize_block_params,
    quantize_weight,
)
from tests.test_fused_block import _params, _tiny_cfg

# ~2-4 min each on the 1-core CI box — excluded from the inner-loop
# subset (`pytest -m 'not slow'`, CLAUDE.md)
pytestmark = __import__('pytest').mark.slow


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 96), jnp.float32) * 0.1
    q, s = jax.jit(quantize_weight)(w)
    assert q.dtype == jnp.int8 and s.shape == (96,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    w_np = np.asarray(w)
    # per-column max quantization error is half a step
    step = np.asarray(s)
    assert (np.abs(deq - w_np) <= 0.5 * step[None, :] + 1e-7).all()
    # zero column gets scale 1 and all-zero codes
    wz = w.at[:, 0].set(0.0)
    qz, sz = jax.jit(quantize_weight)(wz)
    assert float(sz[0]) == 1.0 and not np.asarray(qz)[:, 0].any()


@pytest.mark.parametrize("n", [48, 49])  # even + v5-style odd sequence
def test_q8_block_kernel_matches_direct_math(n):
    c, heads, hid = 64, 4, 256
    qp = jax.jit(quantize_block_params)(
        _params(jax.random.key(0), n, c, heads, hid)
    )
    x = jax.random.normal(jax.random.key(1), (5, n, c), jnp.float32)
    want = np.asarray(_block_math_q8(x, *qp, heads=heads, exact_gelu=False))
    got = np.asarray(
        fused_block(x, qp, heads=heads, block_b=2, interpret=True,
                    quant=True)
    )
    # FP-reassociation of the (identical) f32 pre-quant math can flip a row
    # sitting exactly on an int8 rounding boundary — allow one quant step
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=1e-3)


def test_q8_block_close_to_bf16():
    n, c, heads, hid = 48, 64, 4, 256
    params = _params(jax.random.key(0), n, c, heads, hid)
    qp = jax.jit(quantize_block_params)(params)
    x = jax.random.normal(jax.random.key(1), (5, n, c), jnp.float32)
    ref = np.asarray(_xla_block(x, params, heads, False), np.float32).ravel()
    got = np.asarray(
        fused_block(x, qp, heads=heads, block_b=2, interpret=True,
                    quant=True), np.float32,
    ).ravel()
    cos = (ref @ got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999, cos


def test_q8_chain_matches_per_block():
    n, c, heads, hid = 48, 64, 4, 256
    ps = [_params(jax.random.key(i), n, c, heads, hid) for i in range(3)]
    qps = tuple(jax.jit(quantize_block_params)(p) for p in ps)
    x = jax.random.normal(jax.random.key(9), (4, n, c), jnp.float32)
    want = x
    for qp in qps:
        want = fused_block(want, qp, heads=heads, block_b=2, interpret=True,
                           quant=True)
    got = fused_block_chain(x, qps, heads=heads, block_b=2, interpret=True,
                            quant=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["v3", "v5"])
def test_model_quantized_close_to_bf16(variant):
    """Full model, quantize='w8a8' (megakernel + chained stages) vs the
    plain path on the same params: embeddings stay highly aligned."""
    kw = dict(variant=variant, depth=(2, 2, 2))
    cfg_x = _tiny_cfg(fused_block=False, fused_attention=False, **kw)
    cfg_q = _tiny_cfg(fused_block=True, fused_stage_chain=True,
                      quantize="w8a8", **kw)
    m_x, m_q = build_model(cfg_x), build_model(cfg_q)
    variables = init_params(m_x, jax.random.key(0))
    # identical param trees: quantization happens at dispatch, checkpoints
    # are unchanged
    v_q = init_params(m_q, jax.random.key(0))
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v_q)
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(4, s, s, 3), jnp.float32)
        for s in cfg_x.input_image_scales
    )
    designed = jnp.asarray(r.rand(4, 19), jnp.float32)
    want = np.asarray(m_x.apply(variables, patches, designed, False),
                      np.float32)
    got = np.asarray(m_q.apply(variables, patches, designed, False),
                     np.float32)
    cos = np.sum(want * got, -1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert (cos > 0.995).all(), cos


def test_quantized_partition_parity(tiny_model_cfg, tiny_data_cfg):
    """End-to-end: segmenting a synthetic scene with the quantized model
    (dynamic AND calibrated-static activation scales) produces
    (near-)identical merged partitions to the plain model — the same
    ≤0.5%-pair-disagreement budget as the reference-parity north star
    (BASELINE.md). The static extractor auto-calibrates on its first
    batch (``FeatureExtractor._maybe_calibrate``)."""
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.infer.extract import FeatureExtractor, _tree_has_key
    from deepmerge_tpu.utils.parity import pair_disagreement

    scene = generate_scene(h=128, w=160, n_regions=24, n_objects=6, seed=3)
    edges = np.asarray(scene.rag.edges, np.int32)
    pad = (-len(edges)) % 32
    valid = np.ones(len(edges), bool)
    if pad:
        edges = np.concatenate([edges, np.zeros((pad, 2), np.int32)])
        valid = np.concatenate([valid, np.zeros(pad, bool)])

    maps = {}
    for q in ("", "w8a8", "w8a8-static"):
        cfg = dataclasses.replace(tiny_model_cfg, quantize=q)
        model = build_model(cfg)
        variables = init_params(model, jax.random.key(0))
        fx = FeatureExtractor(model, variables["params"], batch_size=16)
        *_, label_map, _k = fx.segment_scene_device(
            scene, tiny_data_cfg, edges, valid,
            num_regions=scene.regions.num_regions, max_rounds=8,
            region_map=scene.labels,
        )
        maps[q or "bf16"] = np.asarray(label_map)
        if q == "w8a8-static":
            assert not fx._needs_quant_calibration
            assert _tree_has_key(fx.batch_stats, "act_amax")
    for q in ("w8a8", "w8a8-static"):
        dis = pair_disagreement(maps["bf16"], maps[q])
        assert dis <= 0.005, f"{q} partition disagreement {dis:.4f}"


def test_quantize_config_validation():
    from deepmerge_tpu.config import (
        ExperimentalNegativeWarning,
        TrainConfig,
    )

    with pytest.raises(ValueError):
        ModelConfig(quantize="int4")
    with pytest.warns(UserWarning, match="quantize"):
        ModelConfig(quantize="w8a8", fused_block=False)
    with pytest.warns(UserWarning, match="quantize"):
        ModelConfig(quantize="w8a8", variant="vit")
    # the shipping default never warns
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ModelConfig(quantize="w8a8")
        TrainConfig()
    # measured-negative knobs are gated behind ONE loud warning class
    # (VERDICT r4 weak #5); BENCH.md holds the receipts
    with pytest.warns(ExperimentalNegativeWarning, match="w8a8-static"):
        ModelConfig(quantize="w8a8-static")
    with pytest.warns(ExperimentalNegativeWarning, match="attn"):
        ModelConfig(quantize="w8a8+attn")
    with pytest.warns(ExperimentalNegativeWarning, match="chain_stage0"):
        ModelConfig(chain_stage0=True)
    with pytest.warns(ExperimentalNegativeWarning, match="fused_block"):
        TrainConfig(fused_block=True)
    # strictly-dominated combo is PRUNED, not warned
    with pytest.raises(ValueError, match="removed"):
        ModelConfig(quantize="w8a8-static+attn")


def _static_qparams(key_p, key_x, n, c, heads, hid, batch=5):
    """(x, dynamic 17-tuple, static 18-tuple calibrated on x)."""
    from deepmerge_tpu.ops.pallas.fused_block import block_act_amax

    params = _params(key_p, n, c, heads, hid)
    x = jax.random.normal(key_x, (batch, n, c), jnp.float32)
    _, amax = jax.jit(block_act_amax, static_argnames=("heads", "exact_gelu"))(
        x, params, heads=heads, exact_gelu=False
    )
    qp = jax.jit(quantize_block_params)(params)
    qps = jax.jit(quantize_block_params)(params, amax)
    return x, qp, qps


@pytest.mark.parametrize("n", [48, 49])
def test_static_scale_kernel_matches_direct_math(n):
    """18-tuple (calibrated static activation scales) kernel ≡ the direct
    _block_math_q8 math with the same scalars."""
    from deepmerge_tpu.ops.pallas.fused_block import _qdot_static  # noqa: F401

    c, heads, hid = 64, 4, 256
    x, _, qps = _static_qparams(jax.random.key(0), jax.random.key(1),
                                n, c, heads, hid)
    s_act = tuple(qps[17][i] for i in range(7))
    want = np.asarray(
        _block_math_q8(x, *qps[:17], heads=heads, exact_gelu=False,
                       s_act=s_act)
    )
    got = np.asarray(
        fused_block(x, qps, heads=heads, block_b=2, interpret=True,
                    quant=True)
    )
    np.testing.assert_allclose(got, want, rtol=6e-3, atol=1e-3)


def test_static_scale_block_close_to_dynamic_and_bf16():
    n, c, heads, hid = 48, 64, 4, 256
    params = _params(jax.random.key(0), n, c, heads, hid)
    x, qp, qps = _static_qparams(jax.random.key(0), jax.random.key(1),
                                 n, c, heads, hid)
    ref = np.asarray(_xla_block(x, params, heads, False), np.float32).ravel()
    dyn = np.asarray(
        fused_block(x, qp, heads=heads, block_b=2, interpret=True,
                    quant=True), np.float32,
    ).ravel()
    sta = np.asarray(
        fused_block(x, qps, heads=heads, block_b=2, interpret=True,
                    quant=True), np.float32,
    ).ravel()
    for got in (dyn, sta):
        cos = (ref @ got) / (np.linalg.norm(ref) * np.linalg.norm(got))
        assert cos > 0.999, cos
    # static quantizes on a (calibrated) coarser grid than per-row dynamic
    # but must stay in the same neighbourhood
    cos = (dyn @ sta) / (np.linalg.norm(dyn) * np.linalg.norm(sta))
    assert cos > 0.999, cos


def test_static_scale_chain_matches_per_block():
    n, c, heads, hid = 48, 64, 4, 256
    x = jax.random.normal(jax.random.key(9), (4, n, c), jnp.float32)
    qps = []
    for i in range(3):
        _, _, qp18 = _static_qparams(jax.random.key(i), jax.random.key(9),
                                     n, c, heads, hid, batch=4)
        qps.append(qp18)
    want = x
    for qp in qps:
        want = fused_block(want, qp, heads=heads, block_b=2, interpret=True,
                           quant=True)
    got = fused_block_chain(x, tuple(qps), heads=heads, block_b=2,
                            interpret=True, quant=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant", ["v3", "v5"])
def test_model_static_quant_close_to_bf16(variant):
    """Full model with quantize='w8a8-static': one mutable calibration
    apply populates per-block act_amax in batch_stats; the calibrated
    serving pass stays aligned with bf16. Uncalibrated serving raises."""
    kw = dict(variant=variant, depth=(2, 2, 2))
    cfg_x = _tiny_cfg(fused_block=False, fused_attention=False, **kw)
    cfg_q = _tiny_cfg(fused_block=True, fused_stage_chain=True,
                      quantize="w8a8-static", **kw)
    m_x, m_q = build_model(cfg_x), build_model(cfg_q)
    variables = init_params(m_x, jax.random.key(0))
    r = np.random.RandomState(0)
    patches = tuple(
        jnp.asarray(r.rand(4, s, s, 3), jnp.float32)
        for s in cfg_x.input_image_scales
    )
    designed = jnp.asarray(r.rand(4, 19), jnp.float32)
    want = np.asarray(m_x.apply(variables, patches, designed, False),
                      np.float32)

    # uncalibrated static serving fails loudly
    with pytest.raises(ValueError, match="calibrat"):
        m_q.apply(variables, patches, designed, False)

    _, upd = m_q.apply(variables, patches, designed, False,
                       mutable=["batch_stats"])

    def collect_amax(tree, out):
        for k, v in tree.items():
            if k == "act_amax":
                out.append(np.asarray(v))
            elif hasattr(v, "items"):
                collect_amax(v, out)
        return out

    amaxes = collect_amax(upd["batch_stats"], [])
    assert len(amaxes) == 6 and all((a > 0).all() for a in amaxes)
    got = np.asarray(
        m_q.apply(
            {"params": variables["params"],
             "batch_stats": upd["batch_stats"]},
            patches, designed, False,
        ),
        np.float32,
    )
    cos = np.sum(want * got, -1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert (cos > 0.995).all(), cos


def test_static_quant_sharded_matches_single_device(tiny_model_cfg):
    """Static-quant serving through the mesh-sharded extract+merge with
    PRE-CALIBRATED scales reproduces the single-device partition exactly
    (same scales → same deterministic int8 math on both paths)."""
    import jax

    from deepmerge_tpu.config import DataConfig
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.parallel import make_mesh
    from deepmerge_tpu.parallel.distributed import extract_and_merge_sharded

    from tests.helpers import unclamped_max_window

    cfg = dataclasses.replace(tiny_model_cfg, quantize="w8a8-static")
    scene = generate_scene(h=96, w=768, n_regions=24, n_objects=6,
                           points_per_region=1, seed=21)
    dcfg = DataConfig(patch_sizes=(16, 32, 64),
                      max_window=unclamped_max_window(scene),
                      eval_batch_size=8)
    model = build_model(cfg)
    variables = init_params(model, jax.random.key(0))

    extractor = FeatureExtractor(model, variables["params"], batch_size=8)
    emb = extractor.extract_scene(scene, dcfg)  # auto-calibrates
    want = merge_scene_device(scene, emb, threshold=1.0, max_rounds=8)

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    got = extract_and_merge_sharded(
        model, variables["params"], scene, dcfg, mesh,
        threshold=1.0, max_rounds=8, batch_stats=extractor.batch_stats,
    )
    assert got.num_clusters == want.num_clusters
    np.testing.assert_array_equal(got.region_to_cluster,
                                  want.region_to_cluster)


def test_quantized_sharded_extract_matches_single_device(tiny_model_cfg):
    """The quantized model through the mesh-sharded extract+merge path
    (shard_map over disjoint column strips + exact collective merge)
    produces the same partition as single-device quantized serving."""
    import jax

    from deepmerge_tpu.config import DataConfig
    from deepmerge_tpu.infer.extract import FeatureExtractor
    from deepmerge_tpu.infer.merge import merge_scene_device
    from deepmerge_tpu.models.s2former import init_params
    from deepmerge_tpu.geodata.synthetic import generate_scene
    from deepmerge_tpu.parallel import make_mesh
    from deepmerge_tpu.parallel.distributed import extract_and_merge_sharded

    from tests.helpers import unclamped_max_window

    cfg = dataclasses.replace(tiny_model_cfg, quantize="w8a8")
    scene = generate_scene(h=96, w=768, n_regions=24, n_objects=6,
                           points_per_region=1, seed=21)
    dcfg = DataConfig(patch_sizes=(16, 32, 64),
                      max_window=unclamped_max_window(scene),
                      eval_batch_size=8)
    model = build_model(cfg)
    variables = init_params(model, jax.random.key(0))

    extractor = FeatureExtractor(model, variables["params"], batch_size=8)
    emb = extractor.extract_scene(scene, dcfg)
    want = merge_scene_device(scene, emb, threshold=1.0, max_rounds=8)

    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    got = extract_and_merge_sharded(
        model, variables["params"], scene, dcfg, mesh,
        threshold=1.0, max_rounds=8,
    )
    assert got.num_clusters == want.num_clusters
    np.testing.assert_array_equal(got.region_to_cluster,
                                  want.region_to_cluster)
