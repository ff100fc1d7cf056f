"""Shared model building blocks (flax.linen, NHWC, mixed-precision-ready).

TPU-native re-design of the residual encoders that the reference shares
between RAFT, GMFlow and the auxiliary classifier:
  * `adjusted_RAFT/core/extractor.py:6-267` (ResidualBlock, BottleneckBlock,
    BasicEncoder, SmallEncoder)
  * `adjusted_gmflow/gmflow/backbone.py:6-117` (CNNEncoder)
  * `auxiliary_classifier/classifier.py:7-266`

Design notes (TPU-first):
  * NHWC layout everywhere (XLA's preferred conv layout on TPU).
  * ``dtype`` is the compute dtype (bfloat16 for the MXU path); params are
    kept in float32 — this replaces the reference's torch.cuda.amp autocast.
  * Normalizations mirror torch defaults: InstanceNorm2d(affine=False),
    BatchNorm2d(affine=True, running stats), GroupNorm(affine=True).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def kaiming_init():
    """He-normal fan-out init matching `extractor.py:150-157`."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False): normalize over (H, W) per sample/channel.

    Backed by the fused Pallas kernel (`ops/instance_norm.py`: one stats
    sweep + one normalize sweep, optional fused ReLU) on TPU; dense XLA
    elsewhere. Stats accumulate in f32, the normalize stays in the input
    dtype (bf16 rounding of the normalized value is within the network's
    own precision)."""
    epsilon: float = 1e-5
    relu: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.instance_norm import instance_norm
        return instance_norm(x, self.epsilon, self.relu)


def make_norm(norm_fn: str, num_groups: Optional[int] = None,
              dtype: Dtype = jnp.float32) -> Callable:
    """Build a norm layer: 'group' | 'batch' | 'instance' | 'none'.

    'batch' returns a module expecting a ``use_running_average`` kwarg bound
    via flax mutable 'batch_stats' collections (freeze_bn = eval mode).
    """
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=num_groups, dtype=dtype)
    if norm_fn == "batch":
        return nn.BatchNorm(use_running_average=None, momentum=0.9,
                            epsilon=1e-5, dtype=dtype)
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x, **kw: x
    raise ValueError(norm_fn)


def _apply_norm(norm, x, train: bool):
    if isinstance(norm, nn.BatchNorm):
        return norm(x, use_running_average=not train)
    return norm(x)


def _norm_relu(norm_fn: str, ng: Optional[int], dtype: Dtype, x,
               train: bool):
    """norm -> relu, fused into the InstanceNorm kernel when possible."""
    if norm_fn == "instance":
        return InstanceNorm(relu=True)(x)
    return nn.relu(_apply_norm(make_norm(norm_fn, ng, dtype), x, train))


class Conv(nn.Module):
    """2D conv wrapper: NHWC, optional stride/dilation, f32 params."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel[0] - 1) // 2 * self.dilation,
               (self.kernel[1] - 1) // 2 * self.dilation)
        return nn.Conv(self.features, self.kernel,
                       strides=(self.stride, self.stride),
                       padding=((pad[0], pad[0]), (pad[1], pad[1])),
                       kernel_dilation=(self.dilation, self.dilation),
                       use_bias=self.use_bias,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=kaiming_init())(x)


class ResidualBlock(nn.Module):
    """Two 3x3 convs + skip; `extractor.py:6-56` / `backbone.py:6-36`."""
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_bias: bool = True  # GMFlow backbone uses bias=False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ng = self.planes // 8
        y = Conv(self.planes, (3, 3), self.stride, use_bias=self.use_bias,
                 dtype=self.dtype)(x)
        y = _norm_relu(self.norm_fn, ng, self.dtype, y, train)
        y = Conv(self.planes, (3, 3), use_bias=self.use_bias,
                 dtype=self.dtype)(y)
        y = _norm_relu(self.norm_fn, ng, self.dtype, y, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = Conv(self.planes, (1, 1), self.stride, dtype=self.dtype)(x)
            x = _apply_norm(make_norm(self.norm_fn, ng, self.dtype), x, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck; `extractor.py:60-116`."""
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ng = self.planes // 8
        p4 = self.planes // 4
        y = Conv(p4, (1, 1), dtype=self.dtype)(x)
        y = _norm_relu(self.norm_fn, ng, self.dtype, y, train)
        y = Conv(p4, (3, 3), self.stride, dtype=self.dtype)(y)
        y = _norm_relu(self.norm_fn, ng, self.dtype, y, train)
        y = Conv(self.planes, (1, 1), dtype=self.dtype)(y)
        y = _norm_relu(self.norm_fn, ng, self.dtype, y, train)
        if self.stride != 1:
            x = Conv(self.planes, (1, 1), self.stride, dtype=self.dtype)(x)
            x = _apply_norm(make_norm(self.norm_fn, ng, self.dtype), x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """6-res-block encoder to 1/8 resolution; `extractor.py:118-192`.

    ``in_dim`` distinguishes the RAFT image encoder (3ch) from the classifier
    flow encoder (2ch, `classifier.py:135`).
    """
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    stem_dim: int = 64
    dims: Sequence[int] = (64, 96, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.stem_dim, (7, 7), 2, dtype=self.dtype)(x)
        x = _norm_relu(self.norm_fn, 8, self.dtype, x, train)
        for i, (dim, stride) in enumerate(zip(self.dims, (1, 2, 2))):
            x = ResidualBlock(dim, self.norm_fn, stride, dtype=self.dtype)(
                x, train)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype)(x, train)
        x = Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class SmallEncoder(nn.Module):
    """Bottleneck variant; `extractor.py:195-267`."""
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    dims: Sequence[int] = (32, 64, 96)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv(self.dims[0], (7, 7), 2, dtype=self.dtype)(x)
        x = _norm_relu(self.norm_fn, 8, self.dtype, x, train)
        for dim, stride in zip(self.dims, (1, 2, 2)):
            x = BottleneckBlock(dim, self.norm_fn, stride, dtype=self.dtype)(
                x, train)
            x = BottleneckBlock(dim, self.norm_fn, 1, dtype=self.dtype)(
                x, train)
        x = Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
