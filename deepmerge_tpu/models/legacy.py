"""Legacy model families (reference ``Nets.py``, ``MLP.py``, ``Networks.py``).

Kept for capability parity with the reference's earlier experiments:

  * ``MLP`` — 784→250→250→10 leaky-ReLU net returning (logits, penultimate)
    (``Nets.py:11-35``).
  * ``GRUAttention`` — 4-layer bidirectional GRU(h=80) + dot-product
    attention pooling + Linear(160→10) (``Nets.py:48-111``). GRUs are
    inherently sequential; on TPU the recurrence is a ``lax.scan`` per layer
    (flax RNN), fine at these tiny sizes.
  * ``SpatiallyMemorizedNetwork`` — VGG16 features + embedded-Gaussian
    non-local block + GAP + L2-norm, with attention pooling over the three
    context embeddings (``Networks.py:17-174``; nb the reference's
    ``Non_local_block`` import is MISSING in-repo — this supplies the
    standard non-local block it intended).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_trunc01 = nn.initializers.truncated_normal(stddev=0.01, lower=-2.0, upper=2.0)


class MLP(nn.Module):
    """``Nets.py:11-35``: returns (logits, penultimate)."""

    hidden: int = 250
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        h1 = nn.leaky_relu(nn.Dense(self.hidden, name="fc1")(x))
        h2 = nn.leaky_relu(nn.Dense(self.hidden, name="fc2")(h1))
        out = nn.leaky_relu(nn.Dense(self.num_classes, name="fc3")(h2))
        return out, h2


def _dot_attention_pool(x, query):
    """``attention_net`` (``Nets.py:75-93``): softmax(q·xᵀ/√d)·x summed."""
    d_k = query.shape[-1]
    scores = jnp.einsum("bqd,bkd->bqk", query, x) / jnp.sqrt(float(d_k))
    alpha = nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", alpha, x).sum(axis=1)


class GRUAttention(nn.Module):
    """``Nets.py:48-111``: 4-layer bi-GRU + attention pooling + classifier."""

    hidden: int = 80
    num_layers: int = 4
    num_classes: int = 10
    drop: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F)
        h = x
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden), name=f"gru{layer}_fwd")(h)
            bwd = nn.RNN(nn.GRUCell(self.hidden), reverse=True,
                         keep_order=True, name=f"gru{layer}_bwd")(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        query = nn.Dropout(self.drop)(h, deterministic=not train)
        pooled = _dot_attention_pool(h, query)
        return nn.Dense(self.num_classes, name="out")(pooled)


class NonLocalBlock2D(nn.Module):
    """Embedded-Gaussian non-local block (the reference's missing
    ``Non_local_block`` dependency, ``Networks.py:13``)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // 2, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        theta = theta.reshape(b, h * w, inter)
        phi = phi.reshape(b, h * w, inter)
        g = g.reshape(b, h * w, inter)
        attn = nn.softmax(
            jnp.einsum("bnd,bmd->bnm", theta, phi,
                       preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        y = jnp.einsum("bnm,bmd->bnd", attn, g).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="w_z")(y)
        return x + y


_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Features(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                    name=f"conv{i}")(x))
                i += 1
        return x


class SpatiallyMemorizedNetwork(nn.Module):
    """``Networks.py:17-174`` (class name de-typo'd from
    ``SpatiallyMmemorizedNetwork``): per-context L2-normalized VGG+non-local
    embedding; ``pool_contexts`` applies the attention pooling over the
    (inner, object, scene) context embeddings (``:119-146``)."""

    out_channels: int = 512
    reduced_size: int = 512
    drop: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGG16Features(self.dtype, name="vgg16")(x.astype(self.dtype))
        x = NonLocalBlock2D(512, self.dtype, name="nonlocal")(x)
        x = x.mean(axis=(1, 2))  # GAP
        if self.reduced_size < self.out_channels:
            x = nn.Dense(self.reduced_size, dtype=self.dtype, name="reduce")(x)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-6
        return x / norm

    @nn.compact
    def pool_contexts(self, embeddings, train: bool = False):
        """(B, 3, D) context embeddings → (B, D) attention-pooled."""
        query = nn.Dropout(self.drop)(embeddings, deterministic=not train)
        return _dot_attention_pool(embeddings, query)
