"""ViT + multi-scale ScaleEmbedTransformer (reference ``vit_model.py``).

The precursor family to S2Former (imported but not instantiated by the
shipped trainer, ``Train_SMT.py:26``): a timm-style VisionTransformer with
Siamese arg-count dispatch (``vit_model.py:188-317``), and the
ScaleEmbedTransformer (``:321-549``) — four fixed patch embeds (28/4, 56/8,
112/16, 224/32 → 49 tokens each), per-scale learned pos-embeds multiplied
by the sample's scale factors, a cls token, an optional designed-feature
token, and an optional label token + class head.

As with S2Former, the forward here is single-branch; Siamese pairing is the
caller's batch stacking.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deepmerge_tpu.models.s2former import DropPath, FeatureEmbed, Mlp, PatchEmbed

_trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class Attention(nn.Module):
    """Standard multi-head self-attention (no relative bias)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, kernel_init=_trunc02,
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * head_dim ** -0.5, k,
            preferred_element_type=jnp.float32,
        )
        attn = nn.Dropout(self.attn_drop)(
            jnp.astype(nn.softmax(attn, axis=-1), x.dtype),
            deterministic=deterministic,
        )
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, preferred_element_type=jnp.float32
        ).reshape(b, n, c).astype(x.dtype)
        out = nn.Dense(c, kernel_init=_trunc02, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    exact_gelu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp = DropPath(self.drop_path)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, attn_drop=self.attn_drop,
                      proj_drop=self.drop, dtype=self.dtype, name="attn")(
            y, deterministic)
        x = x + dp(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(dim=self.dim, hidden=int(self.dim * self.mlp_ratio),
                drop=self.drop, exact_gelu=self.exact_gelu, dtype=self.dtype,
                name="mlp")(y, deterministic)
        return x + dp(y, deterministic)


class VisionTransformer(nn.Module):
    """Plain ViT encoder (``vit_model.py:188-317``) — single-branch."""

    img_size: int = 224
    patch_size: int = 16
    in_c: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    representation_size: Optional[int] = None
    drop_ratio: float = 0.0
    attn_drop_ratio: float = 0.0
    drop_path_ratio: float = 0.0
    exact_gelu: bool = False    # reference uses erf GELU (vit_model.py:146-148)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        b = x.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                       name="patch_embed")(x.astype(self.dtype))
        cls = self.param("cls_token", _trunc02, (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], 1)
        pos = self.param("pos_embed", _trunc02, (1, x.shape[1], self.embed_dim))
        x = nn.Dropout(self.drop_ratio)(x + pos.astype(self.dtype),
                                        deterministic=det)
        dpr = np.linspace(0, self.drop_path_ratio, self.depth)
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      self.drop_ratio, self.attn_drop_ratio, float(dpr[i]),
                      self.exact_gelu, self.dtype, name=f"block{i}")(x, det)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feat = x[:, 0]
        if self.representation_size:
            feat = nn.tanh(
                nn.Dense(self.representation_size, kernel_init=_trunc02,
                         dtype=self.dtype, name="pre_logits")(feat)
            )
        if self.num_classes > 0:
            return nn.Dense(self.num_classes, kernel_init=_trunc02,
                            dtype=self.dtype, name="head")(feat)
        return feat


class ScaleEmbedTransformer(nn.Module):
    """Multi-scale ViT with scale-modulated pos-embeds (``vit_model.py:321-549``).

    ``__call__(patches, designed, factors, train)``:
      patches — tuple of 4 NHWC arrays at the fixed 28/56/112/224 sizes
      designed — (B, 19) designed features (feature token) or None
      factors — (B, 4) per-sample scale factors multiplying each scale's
        pos-embedded tokens (the reference's ``scales`` list, ``:455-462``)

    Returns the 100-d embedding, plus (class_logits, class_feat) when
    ``label_embed`` is on (``:472-506``).
    """

    num_classes: int = 11
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_dim: int = 100
    feature_embed: bool = True
    label_embed: bool = False
    drop_ratio: float = 0.0
    attn_drop_ratio: float = 0.0
    drop_path_ratio: float = 0.0
    exact_gelu: bool = False
    dtype: Any = jnp.float32

    IMG_SIZES = (28, 56, 112, 224)
    PATCH_SIZES = (4, 8, 16, 32)

    @nn.compact
    def __call__(self, patches, designed=None, factors=None, train: bool = False):
        det = not train
        b = patches[0].shape[0]
        if factors is None:
            factors = jnp.ones((b, 4), self.dtype)
        toks = []
        for i, (sz, ps) in enumerate(zip(self.IMG_SIZES, self.PATCH_SIZES)):
            t = PatchEmbed(ps, self.embed_dim, self.dtype,
                           name=f"patch_embed{i}")(patches[i].astype(self.dtype))
            pos = self.param(f"pos_embed{i}", _trunc02,
                             (1, (sz // ps) ** 2, self.embed_dim))
            toks.append((t + pos.astype(self.dtype)) * factors[:, i][:, None, None])
        x = jnp.concatenate(toks, axis=1)

        cls = self.param("cls_token", _trunc02, (1, 1, self.embed_dim))
        lead = [jnp.tile(cls.astype(self.dtype), (b, 1, 1))]
        if self.label_embed:
            label = self.param("label_token", _trunc02, (1, 1, self.embed_dim))
            lead.append(jnp.tile(label.astype(self.dtype), (b, 1, 1)))
        if self.feature_embed:
            d = FeatureEmbed(self.embed_dim, self.dtype, name="feature_embed")(
                designed.astype(self.dtype)
            )
            lead.append(d[:, None, :])
        x = jnp.concatenate(lead + [x], axis=1)

        x = nn.Dropout(self.drop_ratio)(x, deterministic=det)
        dpr = np.linspace(0, self.drop_path_ratio, self.depth)
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      self.drop_ratio, self.attn_drop_ratio, float(dpr[i]),
                      self.exact_gelu, self.dtype, name=f"block{i}")(x, det)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        emb = nn.Dense(self.out_dim, kernel_init=_trunc02, dtype=self.dtype,
                       name="my_head")(x[:, 0])
        if self.label_embed:
            cf = x[:, 1]
            cf = nn.Dense(self.out_dim, kernel_init=_trunc02, dtype=self.dtype,
                          name="class_fc1")(cf)
            cf = nn.Dropout(0.3)(nn.gelu(cf, approximate=False),
                                 deterministic=det)
            class_feat = nn.Dense(self.out_dim, kernel_init=_trunc02,
                                  dtype=self.dtype, name="class_fc2")(cf)
            logits = nn.Dense(self.num_classes, kernel_init=_trunc02,
                              dtype=self.dtype, name="class_logits")(class_feat)
            return emb, logits, class_feat
        return emb


# ---------------------------------------------------------------------------
# Factories (reference ``vit_model.py:568-661``). Pretrained google-research
# ``.pth`` weights load via ``compat.vit_import.load_torch_vit`` with the
# same partial-load contract the reference uses (``:664-707``).
# ---------------------------------------------------------------------------


def vit_base_patch_scales_224_in21k(
    num_classes: int = 21843, has_logits: bool = True,
    is_feature_embed: bool = True, is_label_embed: bool = False, **kw,
) -> ScaleEmbedTransformer:
    """``vit_model.py:568-578`` — the multi-scale variant.

    NB ``num_classes`` is accepted for factory-signature parity but does
    NOT size the class head: the reference hard-codes
    ``class_logits = nn.Linear(100, 11)`` regardless of the argument
    (``vit_model.py:408-411``), so the 11-way head is pinned here too.
    """
    return ScaleEmbedTransformer(
        num_classes=11, embed_dim=768, depth=12, num_heads=12,
        feature_embed=is_feature_embed, label_embed=is_label_embed, **kw,
    )


def vit_base_patch16_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True, **kw):
    """``vit_model.py:582-597`` (ViT-B/16, ImageNet-21k layout)."""
    return VisionTransformer(
        img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        representation_size=768 if has_logits else None,
        num_classes=num_classes, **kw,
    )


def vit_base_patch32_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True, **kw):
    """``vit_model.py:599-614`` (ViT-B/32)."""
    return VisionTransformer(
        img_size=224, patch_size=32, embed_dim=768, depth=12, num_heads=12,
        representation_size=768 if has_logits else None,
        num_classes=num_classes, **kw,
    )


def vit_large_patch16_224_in21k(num_classes: int = 21843,
                                has_logits: bool = True, **kw):
    """``vit_model.py:617-631`` (ViT-L/16)."""
    return VisionTransformer(
        img_size=224, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        representation_size=1024 if has_logits else None,
        num_classes=num_classes, **kw,
    )


def vit_large_patch32_224_in21k(num_classes: int = 21843,
                                has_logits: bool = True, **kw):
    """``vit_model.py:633-647`` (ViT-L/32)."""
    return VisionTransformer(
        img_size=224, patch_size=32, embed_dim=1024, depth=24, num_heads=16,
        representation_size=1024 if has_logits else None,
        num_classes=num_classes, **kw,
    )


def vit_huge_patch14_224_in21k(num_classes: int = 21843,
                               has_logits: bool = True, **kw):
    """``vit_model.py:650-661`` (ViT-H/14)."""
    return VisionTransformer(
        img_size=224, patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        representation_size=1280 if has_logits else None,
        num_classes=num_classes, **kw,
    )


class ScaleEmbedBackbone(nn.Module):
    """Pipeline adapter: ``(patches, designed, train) -> embedding``.

    Makes the ScaleEmbedTransformer a drop-in backbone for the extraction/
    training pipeline (``config.ModelConfig(variant="vit")``), the wiring
    the reference sketched but never shipped — ``vit_model`` is imported at
    ``Train_SMT.py:26`` yet commented out of ``main()``. The pipeline
    contract passes one ``designed`` vector; per ``MyUtils1.py:151-156``
    its trailing ``factor_slots`` entries ARE the per-scale factors, so the
    adapter slices them for the pos-embed scaling (``vit_model.py:455-462``)
    instead of taking a separate argument.

    Requires ``input_image_scales == (28, 56, 112, 224)`` (the transformer's
    fixed patch-embed sizes) and matching ``data.patch_sizes`` — all four
    slots carry real resize targets here, unlike S2Former's factor-only
    fourth slot.
    """

    cfg: Any  # ModelConfig

    @nn.compact
    def __call__(self, patches, designed, train: bool = False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        vit = ScaleEmbedTransformer(
            num_classes=c.num_classes,
            embed_dim=c.embed_dim,
            depth=sum(c.depth),
            num_heads=c.num_heads,
            mlp_ratio=c.mlp_ratio,
            out_dim=c.out_dim,
            feature_embed=c.use_designed_features,
            label_embed=False,
            drop_ratio=c.drop_ratio,
            attn_drop_ratio=c.attn_drop_ratio,
            drop_path_ratio=c.drop_path_ratio,
            exact_gelu=c.exact_gelu,
            dtype=dtype,
            name="vit",
        )
        factors = None
        if designed is not None:
            factors = designed[:, -4:].astype(dtype)
        return vit(tuple(patches), designed, factors, train)
