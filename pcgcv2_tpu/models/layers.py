"""Flax layers over BlockGrid — thin parameterized wrappers of ops.blocks.

Each layer mirrors one MinkowskiEngine op used by the reference network
(/root/reference/autoencoder.py) on the dense-block backend: 3^3 convs are
halo-assembled MXU convolutions, scale changes are reshape+matmul block
splits/merges, and 1^3 convs are plain per-slot projections.  All stride-1
convs at a scale share one `neighbor_rows` map (ME rebuilds these inside its
coordinate manager; here reuse is explicit in the model code).
"""

from __future__ import annotations

from flax import linen as nn
import jax
import jax.numpy as jnp

from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops.blocks import BlockGrid

# He-uniform over fan_in = kernel_volume * Cin (standard for ReLU stacks).
kernel_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def relu(bg: BlockGrid) -> BlockGrid:
    return bg.with_feats(jax.nn.relu(bg.feats))


class BConv3(nn.Module):
    """3^3 stride-1 sparse conv (ref ME.MinkowskiConvolution kernel_size=3,
    autoencoder.py:13) using a prebuilt block-neighbor map."""

    features: int

    @nn.compact
    def __call__(self, bg: BlockGrid, nbrs) -> BlockGrid:
        w = self.param(
            "kernel", kernel_init,
            (3, 3, 3, bg.channels, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return B.conv3(bg, nbrs, w, b)


class BConv1(nn.Module):
    """1^3 conv — per-voxel dense projection (ref InceptionResNet 1^3 convs,
    autoencoder.py:28-48)."""

    features: int

    @nn.compact
    def __call__(self, bg: BlockGrid) -> BlockGrid:
        w = self.param(
            "kernel", kernel_init,
            (1, bg.channels, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        cd = B.COMPUTE_DTYPE
        out = (
            jnp.dot(
                bg.feats.reshape(-1, bg.channels).astype(cd),
                w[0].astype(cd),
                preferred_element_type=cd,
            ).reshape(bg.nb_cap, B.VOL, self.features)
            + b.astype(cd)
        ).astype(bg.feats.dtype)
        return bg.with_feats(out)


class BConvDown(nn.Module):
    """2^3 stride-2 down-convolution (ref autoencoder.py:78)."""

    features: int
    out_cap: int

    @nn.compact
    def __call__(self, bg: BlockGrid) -> BlockGrid:
        w = self.param(
            "kernel", kernel_init,
            (8, bg.channels, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return B.conv_down(bg, w, b, self.out_cap)


class BGenUp(nn.Module):
    """Generative transposed conv, kernel=2 stride=2 — emits all 8 children
    per voxel (ref ME.MinkowskiGenerativeConvolutionTranspose,
    autoencoder.py:155).  `out_cap` (static block capacity of the output
    grid) can be overridden per call — weights are capacity-independent, so
    slab-decomposed decoders reuse the same parameters at smaller caps."""

    features: int
    out_cap: int

    @nn.compact
    def __call__(self, bg: BlockGrid, out_cap=None) -> BlockGrid:
        w = self.param(
            "kernel", kernel_init,
            (8, bg.channels, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return B.conv_up_generative(
            bg, w, b, self.out_cap if out_cap is None else out_cap
        )


class BInceptionResNet(nn.Module):
    """Two-branch inception residual block (ref autoencoder.py:7-57).

    branch0: 3^3 conv (ch -> ch/4) -> relu -> 3^3 conv (-> ch/2)
    branch1: 1^3 (ch -> ch/4) -> relu -> 3^3 (-> ch/4) -> relu -> 1^3 (-> ch/2)
    output : concat(branch0, branch1) + residual
    """

    channels: int

    @nn.compact
    def __call__(self, bg: BlockGrid, nbrs) -> BlockGrid:
        ch = self.channels
        out0 = BConv3(ch // 4, name="conv0_0")(bg, nbrs)
        out0 = BConv3(ch // 2, name="conv0_1")(relu(out0), nbrs)
        out1 = BConv1(ch // 4, name="conv1_0")(bg)
        out1 = BConv3(ch // 4, name="conv1_1")(relu(out1), nbrs)
        out1 = BConv1(ch // 2, name="conv1_2")(relu(out1))
        merged = jnp.concatenate([out0.feats, out1.feats], axis=-1)
        return bg.with_feats(merged + bg.feats)
