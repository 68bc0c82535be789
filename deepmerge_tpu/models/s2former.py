"""S2Former ("shift-scale" transformer) model family, TPU-native.

Re-design of the reference family ``nets/ShfitScaleFormer.py`` (variants
v1–v6; the shipped model is v3, ``Train_SMT.py:374``) as a single flax.linen
module driven by config:

  * PatchEmbed is reshape+matmul (stride == kernel ⇒ a dense projection over
    patch pixels), not a conv — pure MXU work.
  * Every scale is embedded to the SAME token grid (``cube`` per side,
    ``nets/ShfitScaleFormer.py:807-810``) — the "shift-scale" trick.
  * CrossScaleAttention attends over the concatenated multi-scale sequence
    with a Swin-style 3-D relative-position bias over the (scale, row, col)
    cube (``:104-156``); v5 extends the table for one extra designed-feature
    token (``:207-267``).
  * The model is ALWAYS single-branch: ``apply(params, patches, designed)``
    returns one embedding. Siamese pairing is the caller's batch stacking
    (sidesteps the reference's train/eval forward asymmetry at ``:977-999``).

Variant map (all cited against nets/ShfitScaleFormer.py):
  v1 (:417-607)  4 fixed scales, single stage, per-scale mean-pool head.
  v2 (:610-769)  variable scales, single stage of 12 blocks.
  v3 (:772-1010) 3-stage pyramid 8×8 → 4×4 → 2×2 with per-scale 2×2 avg-pool
                 between stages; shared LayerNorm reused across the model.
  v4 (:1013-1261) v3 + auxiliary deep-supervision heads after stages 0/1.
  v5 (:1264-1503) designed-feature token injected into the backbone, carried
                 through stages; extended rel-pos table.
  v6 (:1506-1569) designed-features-only MLP ablation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.config import ModelConfig


# ---------------------------------------------------------------------------
# Relative-position indices (precomputed, static)
# ---------------------------------------------------------------------------

def rel_pos_index(cube: Sequence[int]) -> np.ndarray:
    """3-D Swin-style relative-position index over a (c, h, w) token cube.

    Returns (N, N) int32 with N = c*h*w, indexing a bias table of size
    (2c-1)(2h-1)(2w-1). Matches ``initial_relative_position_index``
    (nets/ShfitScaleFormer.py:139-156).
    """
    c, h, w = cube
    coords = np.stack(
        np.meshgrid(np.arange(c), np.arange(h), np.arange(w), indexing="ij")
    )
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += c - 1
    rel[..., 1] += h - 1
    rel[..., 2] += w - 1
    rel[..., 1] *= 2 * w - 1
    rel[..., 0] *= (2 * h - 1) * (2 * w - 1)
    return rel.sum(-1).astype(np.int32)


def rel_pos_index_extra_token(cube: Sequence[int]) -> tuple[np.ndarray, int]:
    """v5 index: one extra (designed-feature) token appended to the cube.

    Reproduces the reference's index surgery exactly
    (nets/ShfitScaleFormer.py:218-267): a fresh index per (token → extra)
    column entry, a fresh index per (extra → token) row entry, and
    ``index[-1, -1] = index[0, 0]`` (extra-to-extra reuses the zero-offset
    bias). Returns (N+1, N+1) index and the required table size
    (2c-1)(2h-1)(2w-1) + 2*c*h*w.
    """
    c, h, w = cube
    n = c * h * w
    base = rel_pos_index(cube).astype(np.int64)
    max_id = base.max()
    col = max_id + 1 + np.arange(n).reshape(n, 1)
    idx = np.concatenate([base, col], axis=1)
    max_id = idx.max()
    row = max_id + 1 + np.arange(n + 1).reshape(1, n + 1)
    idx = np.concatenate([idx, row], axis=0)
    idx[-1, -1] = idx[0, 0]
    table_size = (2 * c - 1) * (2 * h - 1) * (2 * w - 1) + 2 * n
    return idx.astype(np.int32), int(table_size)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

# torch nn.LayerNorm default (the reference never overrides it in
# nets/ShfitScaleFormer.py; flax defaults to 1e-6, which would drift).
LN_EPS = 1e-5


class Mlp(nn.Module):
    """Transformer FFN (nets/ShfitScaleFormer.py:39-58)."""

    dim: int
    hidden: int
    drop: float = 0.0
    exact_gelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=_trunc02, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=not self.exact_gelu)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, kernel_init=_trunc02, dtype=self.dtype)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class CrossScaleAttention(nn.Module):
    """Full attention over the multi-scale token cube with 3-D rel-pos bias.

    nets/ShfitScaleFormer.py:84-156 (v1/v3) and :187-296 (v5 extra-token).
    Sequence lengths are tiny (192/48/12 tokens), so a dense bias add is
    cheap; the matmuls dominate and land on the MXU.
    """

    dim: int
    num_heads: int
    cube: tuple[int, int, int]
    extra_token: bool = False
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.extra_token:
            idx, table_size = rel_pos_index_extra_token(self.cube)
        else:
            idx = rel_pos_index(self.cube)
            c, h, w = self.cube
            table_size = (2 * c - 1) * (2 * h - 1) * (2 * w - 1)
        self.rel_index = idx  # static numpy, baked into the jaxpr as constant
        self.bias_table = self.param(
            "rel_pos_bias_table", _trunc02, (table_size, self.num_heads)
        )
        self.qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, kernel_init=_trunc02,
            dtype=self.dtype, name="qkv",
        )
        self.proj = nn.Dense(
            self.dim, kernel_init=_trunc02, dtype=self.dtype, name="proj"
        )
        self.attn_dropout = nn.Dropout(self.attn_drop)
        self.proj_dropout = nn.Dropout(self.proj_drop)

    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        assert n == self.rel_index.shape[0], (
            f"sequence {n} != cube tokens {self.rel_index.shape[0]}"
        )
        head_dim = c // self.num_heads
        qkv_packed = self.qkv(x)  # (b, n, 3c)
        bias = self.bias_table[self.rel_index.reshape(-1)].reshape(
            n, n, self.num_heads
        ).transpose(2, 0, 1)

        use_fused = self.fused and (deterministic or self.attn_drop == 0.0)
        if use_fused:
            # fused VMEM attention straight from the packed qkv projection:
            # no HBM logits tensor, no q/k/v transposes/slices.
            from deepmerge_tpu.ops.pallas.fused_attention import (
                fused_attention_qkv,
            )
            from deepmerge_tpu.ops.pallas.window_gather import default_interpret

            out = fused_attention_qkv(
                qkv_packed, bias, heads=self.num_heads,
                interpret=default_interpret(),
                # training: emit softmax probs from the kernel so the
                # backward skips the f32 logits recompute (bf16 matmuls)
                save_probs=not deterministic,
            )
        else:
            qkv = qkv_packed.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, H, d)
            q = q * (head_dim ** -0.5)
            attn = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
            )
            attn = attn + bias[None].astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = self.attn_dropout(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn.astype(x.dtype), v,
                preferred_element_type=jnp.float32,
            ).reshape(b, n, c).astype(x.dtype)
        out = self.proj(out)
        return self.proj_dropout(out, deterministic=deterministic)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath used at v1 :176)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class _LNParams(nn.Module):
    """LayerNorm's param tree (scale/bias) without the op — the fused block
    kernel applies the normalization itself. Names/shapes/inits match
    ``nn.LayerNorm`` exactly so checkpoints are interchangeable."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones_init(), (self.dim,)),
            self.param("bias", nn.initializers.zeros_init(), (self.dim,)),
        )


class _DenseParams(nn.Module):
    """nn.Dense's kernel/bias params without the matmul."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", _trunc02, (self.in_dim, self.out_dim)),
            self.param("bias", nn.initializers.zeros_init(), (self.out_dim,)),
        )


class _AttnParams(nn.Module):
    """CrossScaleAttention's param tree (qkv/proj/bias table)."""

    dim: int
    num_heads: int
    table_size: int

    @nn.compact
    def __call__(self):
        table = self.param(
            "rel_pos_bias_table", _trunc02, (self.table_size, self.num_heads)
        )
        wq, bq = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        return table, wq, bq, wp, bp


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        wu, bu = _DenseParams(self.dim, self.hidden, name="Dense_0")()
        wd, bd = _DenseParams(self.hidden, self.dim, name="Dense_1")()
        return wu, bu, wd, bd


class CrossScaleBlock(nn.Module):
    """Pre-LN attention + FFN block (nets/ShfitScaleFormer.py:158-184).

    With ``fused_block`` (and ``fused``) on and every stochastic knob at
    zero, the ENTIRE block runs as one Pallas megakernel
    (``ops/pallas/fused_block.py``) — same param tree, same math.
    """

    dim: int
    num_heads: int
    cube: tuple[int, int, int]
    extra_token: bool = False
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    fused: bool = True
    fused_block: bool = False
    exact_gelu: bool = False
    quantize: str = ""  # "", "w8a8[+attn]", "w8a8-static[+attn]"
                        # (ModelConfig.quantize)
    block_bt: int = 2
    dtype: Any = jnp.float32

    @property
    def fused_block_eligible(self) -> bool:
        """True when this block runs as the Pallas megakernel (and so can
        also be chained with its stage neighbours — see S2Former._stage)."""
        return (
            self.fused_block and self.fused
            and self.drop == 0.0 and self.attn_drop == 0.0
            and self.drop_path == 0.0
            # Mosaic has no erf/erfc lowering — exact-GELU (torch-parity)
            # configs take the XLA path
            and not self.exact_gelu
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_fused_params: bool = False):
        if return_fused_params:
            # stage-chaining mode: create/bind this block's params (same
            # tree as every other path) and hand the 13-tuple to the caller
            # instead of computing — S2Former._stage feeds all of a stage's
            # tuples to ONE fused_block_chain kernel. Static-quant configs
            # also hand over the block's calibrated activation amaxes.
            assert self.fused_block_eligible
            params = self._collect_fused_params(x)
            if self.quantize.startswith("w8a8-static"):
                return params, self._quant_act_amax().value
            return params
        if self.fused_block_eligible:
            return self._fused_block(x)
        dp = DropPath(self.drop_path)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        y = CrossScaleAttention(
            dim=self.dim, num_heads=self.num_heads, cube=self.cube,
            extra_token=self.extra_token, attn_drop=self.attn_drop,
            proj_drop=self.drop, fused=self.fused, dtype=self.dtype,
            name="attn",
        )(y, deterministic)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            dim=self.dim, hidden=int(self.dim * self.mlp_ratio),
            drop=self.drop, exact_gelu=self.exact_gelu, dtype=self.dtype,
            name="mlp",
        )(y, deterministic)
        return x + dp(y, deterministic)

    def _collect_fused_params(self, x):
        """Bind this block's params and return the megakernel 13-tuple."""
        if self.extra_token:
            idx, table_size = rel_pos_index_extra_token(self.cube)
        else:
            idx = rel_pos_index(self.cube)
            c_, h_, w_ = self.cube
            table_size = (2 * c_ - 1) * (2 * h_ - 1) * (2 * w_ - 1)
        n = idx.shape[0]
        assert x.shape[1] == n, f"sequence {x.shape[1]} != cube tokens {n}"

        l1s, l1b = _LNParams(self.dim, name="norm1")()
        table, wq, bq, wp, bp = _AttnParams(
            self.dim, self.num_heads, table_size, name="attn"
        )()
        l2s, l2b = _LNParams(self.dim, name="norm2")()
        wu, bu, wd, bd = _MlpParams(
            self.dim, int(self.dim * self.mlp_ratio), name="mlp"
        )()
        bias = table[idx.reshape(-1)].reshape(
            n, n, self.num_heads
        ).transpose(2, 0, 1)

        w = lambda a: a.astype(self.dtype)
        f32 = lambda a: a.astype(jnp.float32)
        return (
            f32(l1s), f32(l1b), w(wq), w(bq), f32(bias), w(wp), w(bp),
            f32(l2s), f32(l2b), w(wu), w(bu), w(wd), w(bd),
        )

    def _quant_act_amax(self):
        """The block's calibrated activation abs-maxes (``w8a8-static``).

        Lives in the ``batch_stats`` collection so it rides the existing
        non-param variable plumbing (extractor threading, mesh replication,
        checkpoints) exactly like the v4/v5 BatchNorm statistics.
        """
        if not self.has_variable("batch_stats", "act_amax") and (
            not self.is_mutable_collection("batch_stats")
        ):
            raise ValueError(
                "model.quantize='w8a8-static' needs calibrated activation "
                "scales: run inference through FeatureExtractor (it "
                "auto-calibrates on the first batch) or apply the model "
                "once with mutable=['batch_stats'] to populate "
                "batch_stats['.../act_amax']"
            )
        return self.variable(
            "batch_stats", "act_amax", lambda: jnp.zeros((7,), jnp.float32)
        )

    def _fused_block(self, x):
        from deepmerge_tpu.ops.pallas.fused_block import (
            block_act_amax,
            fused_block,
            quantize_block_params,
        )
        from deepmerge_tpu.ops.pallas.window_gather import default_interpret

        params = self._collect_fused_params(x)
        if self.quantize:
            # w8a8: int8 MXU dots for qkv/proj/mlp (26.1 vs 37.5 ms/block
            # at the stage-0 operating point on v5e — BENCH.md round-3).
            # Weights re-quantize per dispatch (XLA ops outside the kernel;
            # ~0.1 ms for the whole model) so the param tree is unchanged.
            # "+attn" also routes q@kT / p@v through the int8 MXU.
            act_amax = None
            if self.quantize.startswith("w8a8-static"):
                amax_var = self._quant_act_amax()
                if self.is_mutable_collection("batch_stats"):
                    # CALIBRATION pass: bf16 XLA forward with amax taps;
                    # running max across calibration batches.
                    out, amax = block_act_amax(
                        x.astype(self.dtype), params,
                        heads=self.num_heads, exact_gelu=self.exact_gelu,
                    )
                    amax_var.value = jnp.maximum(amax_var.value, amax)
                    return out.astype(self.dtype)
                act_amax = amax_var.value
            return fused_block(
                x.astype(self.dtype),
                quantize_block_params(params, act_amax=act_amax),
                heads=self.num_heads, exact_gelu=self.exact_gelu,
                block_b=self.block_bt, interpret=default_interpret(),
                quant=True, quant_attn=self.quantize.endswith("+attn"),
            )
        # VMEM tile size: bt=2 everywhere. Isolated-kernel sweeps prefer
        # bigger tiles for the short stage-1/2 sequences (9.3 vs 11.5ms at
        # n=48), but inside the full extraction program per-stage tile
        # sizes regressed end-to-end 3.13 → 1.86 MPix/s — whole-program
        # scheduling dominates the isolated optimum.
        return fused_block(
            x.astype(self.dtype), params, heads=self.num_heads,
            exact_gelu=self.exact_gelu, block_b=self.block_bt,
            interpret=default_interpret(),
        )


class PatchEmbed(nn.Module):
    """Image → token grid as reshape + dense (stride == kernel conv).

    nets/ShfitScaleFormer.py:12-37; per-scale patch size is chosen so every
    scale yields the same ``grid × grid`` token count (:807-810).
    Input is NHWC.
    """

    patch: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch
        assert h % p == 0 and w % p == 0, f"{h}x{w} not divisible by {p}"
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)


class FeatureEmbed(nn.Module):
    """19-d designed features → embed_dim token.

    nets/ShfitScaleFormer.py:60-82: three 1×1 Conv1d (== dense over the
    feature axis) with GELU after the first only. (Tiny tensor — exact GELU
    kept for parity.)
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj0")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj1")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj2")(x)
        return x


class AuxBlock(nn.Module):
    """Deep-supervision head (v4/v5; nets/ShfitScaleFormer.py:329-415).

    Per-scale: token grid → 2×2 valid conv + BN + ReLU + Dropout2d + 1×1
    conv to dim/n_scales → GAP; concat scales (+ extra-token slice for v5),
    LayerNorm (base variant only), linear to out_dim.
    """

    dim: int
    out_dim: int
    cube: tuple[int, int, int]
    with_extra_token: bool = False
    drop: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c, h, w = self.cube
        parts = []
        conv1 = nn.Conv(
            self.dim, (2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, name="conv1",
        )
        bn = nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name="bn"
        )
        conv2 = nn.Conv(self.dim // c, (1, 1), dtype=self.dtype, name="conv2")
        # Dropout2d semantics (nets/ShfitScaleFormer.py:340): whole feature
        # CHANNELS drop per sample — broadcast the mask over the NHWC
        # spatial dims, not element-wise
        drop = nn.Dropout(self.drop, broadcast_dims=(1, 2))
        for i in range(c):
            xi = x[:, h * w * i : h * w * (i + 1), :]
            xi = xi.reshape(xi.shape[0], h, w, self.dim)
            xi = nn.relu(bn(conv1(xi)))
            xi = drop(xi, deterministic=deterministic)
            xi = conv2(xi)
            parts.append(jnp.mean(xi, axis=(1, 2)))
        y = jnp.concatenate(parts, axis=-1)
        if self.with_extra_token:
            extra = x[:, h * w * c :, :].reshape(x.shape[0], -1)
            y = jnp.concatenate([y, extra], axis=-1)
        else:
            y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(y)
        return nn.Dense(self.out_dim, kernel_init=_trunc02, dtype=self.dtype,
                        name="out")(y)


# ---------------------------------------------------------------------------
# The family
# ---------------------------------------------------------------------------

def _pool2x2_per_scale(x, n_scales: int, grid: int):
    """Per-scale 2×2 average pooling of the token cube.

    (B, n·g², D) row-major per-scale grids → (B, n·(g/2)², D). Matches the
    AvgPool2d(k=2, s=2) loops at nets/ShfitScaleFormer.py:892-914.
    """
    b, _, d = x.shape
    g = grid
    x = x.reshape(b, n_scales, g // 2, 2, g // 2, 2, d)
    x = x.mean(axis=(3, 5))
    return x.reshape(b, n_scales * (g // 2) ** 2, d)


class S2Former(nn.Module):
    """The S2Former family as one config-driven module.

    ``__call__(patches, designed, train)`` — single-branch forward returning
    the out_dim-d embedding (plus aux outputs for v4/v5 when training).
    ``patches`` is a tuple of (B, s, s, C) NHWC arrays, one per input scale.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        n = cfg.n_scales
        self.dtype_ = dtype
        if cfg.variant == "v6":
            self.feature_embed = FeatureEmbed(cfg.embed_dim, dtype, name="feature_embed")
            self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="norm")
            self.final_with_design = nn.Dense(
                cfg.out_dim, kernel_init=_trunc02, dtype=dtype,
                name="final_features_with_design",
            )
            return

        grid = cfg.cube
        self.patch_embeds = [
            PatchEmbed(
                patch=s // grid, dim=cfg.embed_dim, dtype=dtype,
                name=f"patch_embed{i}",
            )
            for i, s in enumerate(cfg.input_image_scales)
        ]
        if cfg.use_designed_features or cfg.variant == "v5":
            self.feature_embed = FeatureEmbed(cfg.embed_dim, dtype, name="feature_embed")
        self.norm = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="norm")
        self.pos_drop = nn.Dropout(cfg.drop_ratio)

        extra = cfg.variant == "v5"

        def stage(depth, g, tag, drop_path=None):
            return [
                CrossScaleBlock(
                    dim=cfg.embed_dim, num_heads=cfg.num_heads,
                    cube=(n, g, g), extra_token=extra,
                    mlp_ratio=cfg.mlp_ratio, drop=cfg.drop_ratio,
                    attn_drop=cfg.attn_drop_ratio,
                    drop_path=(drop_path[i] if drop_path else 0.0),
                    fused=cfg.fused_attention,
                    fused_block=cfg.fused_block,
                    block_bt=cfg.fused_block_bt,
                    exact_gelu=cfg.exact_gelu,
                    quantize=cfg.quantize,
                    dtype=dtype, name=f"{tag}_{i}",
                )
                for i in range(depth)
            ]

        if cfg.variant in ("v1", "v2"):
            depth = cfg.depth[0]
            dpr = (
                list(np.linspace(0, cfg.drop_path_ratio, depth))
                if cfg.variant == "v1"
                else None
            )
            self.blocks0 = stage(depth, grid, "blocks0", dpr)
        else:
            self.blocks0 = stage(cfg.depth[0], grid, "blocks0")
            self.blocks1 = stage(cfg.depth[1], grid // 2, "blocks1")
            self.blocks2 = stage(cfg.depth[2], grid // 4, "blocks2")

        self.final = nn.Dense(
            cfg.out_dim, kernel_init=_trunc02, dtype=dtype,
            name="final_features",
        )
        self.final_with_design = nn.Dense(
            cfg.out_dim, kernel_init=_trunc02, dtype=dtype,
            name="final_features_with_design",
        )
        if cfg.variant == "v5":
            self.last_block_features = nn.Dense(
                cfg.embed_dim, kernel_init=_trunc02, dtype=dtype,
                name="last_block_features",
            )
        if cfg.variant in ("v4", "v5"):
            self.aux0 = AuxBlock(
                dim=cfg.embed_dim, out_dim=cfg.out_dim, cube=(n, grid, grid),
                with_extra_token=extra, dtype=dtype, name="aux0",
            )
            self.aux1 = AuxBlock(
                dim=cfg.embed_dim, out_dim=cfg.out_dim,
                cube=(n, grid // 2, grid // 2), with_extra_token=extra,
                dtype=dtype, name="aux1",
            )
        self.head = nn.Dense(
            cfg.num_classes, kernel_init=_trunc02, dtype=dtype, name="head"
        )

    # -- pieces -------------------------------------------------------------

    def _patch_embed(self, patches):
        tokens = [pe(p.astype(self.dtype_)) for pe, p in zip(self.patch_embeds, patches)]
        return jnp.concatenate(tokens, axis=1)

    def _designed_embed(self, designed):
        x = self.feature_embed(designed.astype(self.dtype_))
        return self.norm(x)

    def _mean_pool_scales(self, x, tokens_per_scale: int):
        b, _, d = x.shape
        n = self.cfg.n_scales
        core = x[:, : n * tokens_per_scale, :]
        pooled = core.reshape(b, n, tokens_per_scale, d).mean(axis=2)
        return pooled.reshape(b, n * d)

    def _stage(self, blocks, x, det, chain: bool):
        """Run a stage's blocks — as ONE chained Pallas kernel when eligible
        (all weights VMEM-resident, no inter-block HBM round-trips; sized
        for the short stage-1/2 sequences) else block-by-block."""
        quant = blocks[0].quantize if blocks else ""
        calibrating = quant.startswith("w8a8-static") and (
            self.is_mutable_collection("batch_stats")
        )
        if (
            chain and len(blocks) > 1 and blocks[0].fused_block_eligible
            # static-quant CALIBRATION runs block-by-block so each block
            # records its own activation amaxes (the serving pass chains)
            and not calibrating
        ):
            from deepmerge_tpu.ops.pallas.fused_block import (
                fused_block_chain,
                quantize_block_params,
            )
            from deepmerge_tpu.ops.pallas.window_gather import (
                default_interpret,
            )

            params_list = tuple(
                blk(x, det, return_fused_params=True) for blk in blocks
            )
            if quant.startswith("w8a8-static"):
                params_list = tuple(
                    quantize_block_params(p, act_amax=a)
                    for p, a in params_list
                )
            elif quant:
                params_list = tuple(
                    quantize_block_params(p) for p in params_list
                )
            return fused_block_chain(
                x.astype(self.dtype_), params_list,
                heads=self.cfg.num_heads, exact_gelu=self.cfg.exact_gelu,
                block_b=self.cfg.fused_block_bt,
                interpret=default_interpret(), quant=bool(quant),
                quant_attn=quant.endswith("+attn"),
            )
        for blk in blocks:
            x = blk(x, det)
        return x

    # -- forward ------------------------------------------------------------

    def __call__(self, patches, designed=None, train: bool = False):
        cfg = self.cfg
        det = not train
        if cfg.variant == "v6":
            x = self.norm(self.feature_embed(designed.astype(self.dtype_)))
            return self.final_with_design(x)

        x = self._patch_embed(patches)
        x = self.pos_drop(x, deterministic=det)
        g = cfg.cube
        n = cfg.n_scales

        if cfg.variant in ("v1", "v2"):
            for blk in self.blocks0:
                x = blk(x, det)
            x = self.norm(x)
            pooled = self._mean_pool_scales(x, g * g)
            if cfg.use_designed_features:
                d = self._designed_embed(designed)
                return self.final_with_design(
                    jnp.concatenate([pooled, d], axis=-1)
                )
            return self.final(pooled)

        if cfg.variant == "v5":
            d = self._designed_embed(designed)
            x = jnp.concatenate([x, d[:, None, :]], axis=1)

        aux0 = aux1 = None
        chain = cfg.fused_stage_chain
        x = self._stage(self.blocks0, x, det, chain and cfg.chain_stage0)
        if cfg.variant in ("v4", "v5"):
            aux = self.aux0(x, det)
            aux0 = aux
        extra = x[:, n * g * g :, :]  # empty unless v5
        x = _pool2x2_per_scale(x[:, : n * g * g, :], n, g)
        x = jnp.concatenate([x, extra], axis=1)
        x = self.norm(x)

        x = self._stage(self.blocks1, x, det, chain)
        if cfg.variant in ("v4", "v5"):
            aux1 = self.aux1(x, det)
        g1 = g // 2
        extra = x[:, n * g1 * g1 :, :]
        x = _pool2x2_per_scale(x[:, : n * g1 * g1, :], n, g1)
        x = jnp.concatenate([x, extra], axis=1)
        x = self.norm(x)

        x = self._stage(self.blocks2, x, det, chain)
        x = self.norm(x)
        g2 = g // 4

        if cfg.variant == "v5":
            b = x.shape[0]
            pooled = self._mean_pool_scales(x, g2 * g2)
            extra = x[:, n * g2 * g2 :, :].mean(axis=1)
            feats = self.last_block_features(
                jnp.concatenate([pooled.reshape(b, -1), extra], axis=-1)
            )
            d = self._designed_embed(designed)
            out = self.final_with_design(jnp.concatenate([feats, d], axis=-1))
            if train:
                return out, aux0, aux1
            return out

        pooled = self._mean_pool_scales(x, g2 * g2)
        if cfg.use_designed_features:
            d = self._designed_embed(designed)
            out = self.final_with_design(jnp.concatenate([pooled, d], axis=-1))
        else:
            out = self.final(pooled)
        if cfg.variant == "v4" and train:
            return out, aux0, aux1
        return out

    def classify(self, embedding):
        """Optional class head over the 100-d embedding (ref ``head``)."""
        return self.head(embedding)


def build_model(cfg: ModelConfig):
    """Backbone factory for the pipeline: S2Former v1–v6, or the
    ScaleEmbedTransformer precursor via ``variant="vit"`` (adapter in
    ``models/vit.py`` — the wiring the reference imported but never ran,
    ``Train_SMT.py:26``)."""
    if cfg.variant == "vit":
        if tuple(cfg.input_image_scales) != (28, 56, 112, 224):
            raise ValueError(
                "variant='vit' uses the ScaleEmbedTransformer's FIXED "
                "patch-embed sizes: set model.input_image_scales=28,56,112,"
                "224 (and data.patch_sizes to match) — got "
                f"{tuple(cfg.input_image_scales)} (vit_model.py:359-362)"
            )
        from deepmerge_tpu.models.vit import ScaleEmbedBackbone

        return ScaleEmbedBackbone(cfg)
    from deepmerge_tpu.config import KNOWN_VARIANTS

    if cfg.variant not in KNOWN_VARIANTS:
        raise ValueError(
            f"unknown model.variant {cfg.variant!r} "
            f"(known: {sorted(KNOWN_VARIANTS)}) — when adding a variant, "
            "also add it to config.CROSS_SCALE_BLOCK_VARIANTS if its "
            "backbone uses CrossScaleBlocks (megakernel/quantize eligibility)"
        )
    if cfg.variant == "v1":
        assert cfg.n_scales == 4, "v1 uses 4 fixed scales (ref :454-457)"
    return S2Former(cfg)


def init_params(model: S2Former, rng, batch: int = 2):
    """Initialize parameters with dummy inputs of the configured shapes."""
    cfg = model.cfg
    patches = tuple(
        jnp.zeros((batch, s, s, cfg.in_channels), jnp.float32)
        for s in cfg.input_image_scales
    )
    designed = jnp.zeros((batch, cfg.designed_feature_dim), jnp.float32)
    return model.init({"params": rng}, patches, designed, False)
