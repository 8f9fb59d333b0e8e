"""Flax layers over SparseVoxels: thin parameterized wrappers of ops.sparse.

Each layer mirrors one MinkowskiEngine op used by the reference network
(autoencoder.py) but takes explicit, reusable kernel maps — the TPU-first
restructuring that lets all stride-1 convolutions at a scale share a single
searchsorted pass.
"""

from __future__ import annotations

from flax import linen as nn
import jax
import jax.numpy as jnp

from pcgcv2_tpu import ops
from pcgcv2_tpu.ops.sparse import SparseVoxels

# He-uniform over fan_in = kernel_volume * Cin, the standard init for
# ReLU conv stacks (param shape [K, Cin, Cout] -> flax computes
# fan_in = K * Cin automatically).
kernel_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def relu(sv: SparseVoxels) -> SparseVoxels:
    return sv.with_feats(jax.nn.relu(sv.feats))


class SpConv3(nn.Module):
    """3x3x3 stride-1 sparse conv using a prebuilt kernel map
    (ref ME.MinkowskiConvolution(kernel_size=3, stride=1))."""

    features: int
    group_size: int = 9

    @nn.compact
    def __call__(self, sv: SparseVoxels, kmap) -> SparseVoxels:
        w = self.param("kernel", kernel_init, (27, sv.channels, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return ops.conv(sv, kmap, w, b, group_size=self.group_size)


class SpConv1(nn.Module):
    """1x1x1 conv — a per-voxel dense projection (ref kernel_size=1 convs in
    InceptionResNet, autoencoder.py:28-48)."""

    features: int

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> SparseVoxels:
        w = self.param("kernel", kernel_init, (1, sv.channels, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = (
            jnp.dot(sv.feats, w[0], preferred_element_type=jnp.float32)
            + b
        ).astype(sv.feats.dtype)
        return sv.with_feats(out)


class SpConvDown(nn.Module):
    """2x2x2 stride-2 down-convolution (ref ME.MinkowskiConvolution
    kernel_size=2, stride=2, autoencoder.py:78)."""

    features: int
    out_capacity: int

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> SparseVoxels:
        w = self.param("kernel", kernel_init, (8, sv.channels, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return ops.conv_down(sv, w, b, self.out_capacity)


class SpGenUp(nn.Module):
    """Generative transposed conv, kernel=2 stride=2 — emits all 8 children
    per parent (ref ME.MinkowskiGenerativeConvolutionTranspose,
    autoencoder.py:155)."""

    features: int

    @nn.compact
    def __call__(self, sv: SparseVoxels) -> SparseVoxels:
        w = self.param("kernel", kernel_init, (8, sv.channels, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return ops.conv_up_generative(sv, w, b)


class InceptionResNet(nn.Module):
    """Two-branch inception residual block (ref autoencoder.py:7-57).

    branch0: 3^3 conv (ch -> ch/4) -> relu -> 3^3 conv (-> ch/2)
    branch1: 1^3 (ch -> ch/4) -> relu -> 3^3 (-> ch/4) -> relu -> 1^3 (-> ch/2)
    output : concat(branch0, branch1) + residual
    """

    channels: int

    @nn.compact
    def __call__(self, sv: SparseVoxels, kmap) -> SparseVoxels:
        ch = self.channels
        out0 = SpConv3(ch // 4, name="conv0_0")(sv, kmap)
        out0 = SpConv3(ch // 2, name="conv0_1")(relu(out0), kmap)
        out1 = SpConv1(ch // 4, name="conv1_0")(sv)
        out1 = SpConv3(ch // 4, name="conv1_1")(relu(out1), kmap)
        out1 = SpConv1(ch // 2, name="conv1_2")(relu(out1))
        merged = jnp.concatenate([out0.feats, out1.feats], axis=-1)
        return sv.with_feats(merged + sv.feats)
