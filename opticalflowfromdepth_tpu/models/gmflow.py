"""GMFlow (adjusted) — TPU-native flax implementation (M2).

Re-design of `adjusted_gmflow/gmflow/` (gmflow.py, backbone.py,
transformer.py, matching.py, position.py, trident_conv.py, utils.py):

  * CNN encoder to 1/8 (or 1/4+1/8 via weight-shared multi-stride trident
    convs, `backbone.py:39-117`, `trident_conv.py:10-90`);
  * sine positional embedding (`position.py:9-46`);
  * 6-layer transformer of interleaved self/cross blocks with Swin-style
    window split + alternating shifted windows and masks
    (`transformer.py:19-322`);
  * matching: global correlation softmax-argmax over all pairs
    (`matching.py:7-36`) or windowed local correlation (`matching.py:39-83`);
  * flow propagation by feature self-attention (`transformer.py:325-409`);
  * multi-scale refinement with flow_warp and convex upsampling
    (`gmflow.py:92-170`).

TPU-first: NHWC/[B, L, C] token layout; all attention/correlation matmuls
hit the MXU with f32 accumulation (`preferred_element_type`); bidirectional
prediction by batch-dim feature swap exactly as `gmflow.py:115-117` /
`matching.py:23-27`. For large images the [B, L, L] global-matching product
is token-shardable over the mesh (SURVEY.md §5.7).
"""

from __future__ import annotations

import math
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from ..core.geometry import pixel_grid
from ..ops.flash import flash_softmax_matmul
from ..ops.sampling import flow_warp, resize_bilinear_align_corners
from .layers import Conv, InstanceNorm, kaiming_init
from .raft import convex_upsample

Dtype = Any


def _use_flash() -> bool:
    """Pallas streaming softmax on TPU; dense XLA elsewhere (CPU tests).
    OFD_FLASH=interpret forces the kernels in interpret mode (CPU-mesh
    dryruns exercise the Pallas path without a chip); OFD_FLASH=off
    disables them on TPU."""
    env = os.environ.get("OFD_FLASH", "")
    if env == "interpret":
        return True
    if env == "off":
        return False
    return jax.default_backend() == "tpu"


def _flash_interpret() -> bool:
    return os.environ.get("OFD_FLASH", "") == "interpret"


def _seq_parallel(mesh: Optional[Mesh], axis: str) -> bool:
    return mesh is not None and axis in mesh.shape and mesh.shape[axis] > 1


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------

class _ResBlock(nn.Module):
    """GMFlow backbone residual block (bias-free convs, instance norm);
    `backbone.py:6-36`."""
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, (3, 3), self.stride, self.dilation,
                 use_bias=False, dtype=self.dtype)(x)
        y = InstanceNorm(relu=True)(y)
        y = Conv(self.planes, (3, 3), 1, self.dilation, use_bias=False,
                 dtype=self.dtype)(y)
        y = InstanceNorm(relu=True)(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = Conv(self.planes, (1, 1), self.stride, dtype=self.dtype)(x)
            x = InstanceNorm()(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """`backbone.py:39-117` — features at 1/8 (num_scales=1) or
    [1/8, 1/4] handled by a weight-shared trident conv (num_scales=2)."""
    output_dim: int = 128
    num_output_scales: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        dims = (64, 96, 128)
        x = Conv(dims[0], (7, 7), 2, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(InstanceNorm()(x))
        for blk_dim, stride in ((dims[0], 1), (dims[1], 2)):
            x = _ResBlock(blk_dim, stride, dtype=self.dtype)(x)
            x = _ResBlock(blk_dim, 1, dtype=self.dtype)(x)
        stride3 = 2 if self.num_output_scales == 1 else 1
        x = _ResBlock(dims[2], stride3, dtype=self.dtype)(x)
        x = _ResBlock(dims[2], 1, dtype=self.dtype)(x)
        x = Conv(self.output_dim, (1, 1), dtype=self.dtype)(x)

        if self.num_output_scales == 1:
            return [x]
        # trident: one weight, multiple strides (`trident_conv.py:64-72`)
        kernel = self.param(
            "trident_kernel", kaiming_init(),
            (3, 3, self.output_dim, self.output_dim), jnp.float32)
        strides = (1, 2, 4, 8)[: self.num_output_scales]
        outs = []
        for s in strides:
            outs.append(jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(s, s), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return outs  # high to low resolution


# ---------------------------------------------------------------------------
# position embedding & window utilities
# ---------------------------------------------------------------------------

def position_embedding_sine(h: int, w: int, num_pos_feats: int = 64,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """[H, W, 2*num_pos_feats] sine embedding; `position.py:26-46`."""
    scale = 2 * math.pi
    y_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x_embed = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]),
                       jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]),
                       jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def split_feature(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*K*K, H/K, W/K, C]; `gmflow/utils.py:5-30`."""
    b, h, w, c = x.shape
    k = num_splits
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def merge_splits(x: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """Inverse of split_feature; `gmflow/utils.py:33-52`."""
    bk, hk, wk, c = x.shape
    k = num_splits
    b = bk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * hk, k * wk, c)


def feature_add_position(feature0, feature1, attn_splits: int, channels: int):
    """Add sine position (inside each window when split); `utils.py:66-86`."""
    if attn_splits > 1:
        f0s = split_feature(feature0, attn_splits)
        f1s = split_feature(feature1, attn_splits)
        pos = position_embedding_sine(f0s.shape[1], f0s.shape[2],
                                      channels // 2)
        f0s = f0s + pos
        f1s = f1s + pos
        return merge_splits(f0s, attn_splits), merge_splits(f1s, attn_splits)
    pos = position_embedding_sine(feature0.shape[1], feature0.shape[2],
                                  channels // 2)
    return feature0 + pos, feature1 + pos


def shift_window_attn_mask(h: int, w: int, window_h: int, window_w: int,
                           shift_h: int, shift_w: int) -> jnp.ndarray:
    """Swin SW-MSA mask [K*K, win, win]; `transformer.py:19-43`."""
    img_mask = jnp.zeros((1, h, w, 1), jnp.float32)
    cnt = 0
    for hs in (slice(0, h - window_h), slice(h - window_h, h - shift_h),
               slice(h - shift_h, h)):
        for ws in (slice(0, w - window_w), slice(w - window_w, w - shift_w),
                   slice(w - shift_w, w)):
            img_mask = img_mask.at[:, hs, ws, :].set(cnt)
            cnt += 1
    windows = split_feature(img_mask, w // window_w)
    windows = windows.reshape(-1, window_h * window_w)
    mask = windows[:, None, :] - windows[:, :, None]
    return jnp.where(mask != 0, -100.0, 0.0)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def _full_attention(q, k, v):
    """[B, L, C] single-head attention; `transformer.py:8-16`."""
    c = q.shape[-1]
    if _use_flash():
        return flash_softmax_matmul(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            interpret=_flash_interpret()).astype(v.dtype)
    scores = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / (c ** 0.5)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmc->blc", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _window_shard_axes(mesh: Mesh, batch: int,
                       num_windows: int, with_shift: bool):
    """Mesh axes over which the window-batch axis of Swin attention can be
    sharded, or None when it cannot (SURVEY.md §5.7, VERDICT r3 item 6).

    Windows are independent batch entries after ``split_feature``, so they
    shard freely — except that the in-kernel analytic shifted-window mask
    derives the window id from the kernel's local batch index mod K^2.
    Sharding in B-MAJOR chunks (every device gets whole K^2 window groups)
    preserves that phase, which requires ``n_devices | batch``; non-shifted
    layers only need ``n_devices | num_windows``. Falls back to the
    replicated path otherwise.
    """
    axes = tuple(mesh.axis_names)
    n = mesh.size
    need = batch if with_shift else num_windows
    return axes if need % n == 0 else None


def _split_window_attention(q, k, v, num_splits: int, with_shift: bool,
                            h: int, w: int, attn_mask,
                            mesh: Optional[Mesh] = None,
                            model_axis: str = "model"):
    """Swin window attention; `transformer.py:46-105`.

    With a (data, model) mesh the window-batch axis is sharded over BOTH
    axes under `shard_map` (windows are independent), so the whole
    transformer — not just matching/propagation — scales with the mesh."""
    b, _, c = q.shape
    wh, ww = h // num_splits, w // num_splits
    q = q.reshape(b, h, w, c)
    k = k.reshape(b, h, w, c)
    v = v.reshape(b, h, w, c)

    if with_shift:
        sh, sw = wh // 2, ww // 2
        q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, (-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, (-sh, -sw), axis=(1, 2))

    qs = split_feature(q, num_splits).reshape(-1, wh * ww, c)
    ks = split_feature(k, num_splits).reshape(-1, wh * ww, c)
    vs = split_feature(v, num_splits).reshape(-1, wh * ww, c)

    if _use_flash():
        # windows are just batch entries to the streaming kernel; the
        # shifted-window mask is generated analytically inside the kernel
        # (swin=...), so neither the [L, L] scores nor the mask ever
        # reach HBM
        swin = (num_splits, wh, ww, wh // 2, ww // 2) if with_shift else None
        shard_axes = (None if mesh is None or not _seq_parallel(
            mesh, model_axis) else _window_shard_axes(
                mesh, b, qs.shape[0], with_shift))
        if shard_axes is not None:
            from jax.sharding import PartitionSpec as _P
            spec = _P(shard_axes, None, None)
            interp = _flash_interpret()
            out = jax.shard_map(
                lambda a, bq, cv: flash_softmax_matmul(
                    a, bq, cv, swin=swin, interpret=interp),
                mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                # pallas_call does not carry vma metadata for shard_map's
                # varying-mesh-axes check; the body is per-window pure
                check_vma=False,
            )(qs.astype(jnp.bfloat16), ks.astype(jnp.bfloat16),
              vs.astype(jnp.bfloat16)).astype(vs.dtype)
        else:
            out = flash_softmax_matmul(
                qs.astype(jnp.bfloat16), ks.astype(jnp.bfloat16),
                vs.astype(jnp.bfloat16), swin=swin,
                interpret=_flash_interpret()).astype(vs.dtype)
    else:
        scores = jnp.einsum("blc,bmc->blm", qs, ks,
                            preferred_element_type=jnp.float32) / (c ** 0.5)
        if with_shift:
            scores = scores + jnp.tile(attn_mask, (b, 1, 1))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("blm,bmc->blc", attn.astype(vs.dtype), vs,
                         preferred_element_type=jnp.float32).astype(vs.dtype)
    out = merge_splits(out.reshape(-1, wh, ww, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (wh // 2, ww // 2), axis=(1, 2))
    return out.reshape(b, h * w, c)


class TransformerLayer(nn.Module):
    """Single attention layer (+FFN unless no_ffn); `transformer.py:108-185`."""
    d_model: int = 128
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None
    model_axis: str = "model"

    @nn.compact
    def __call__(self, source, target, h, w, attn_mask, attn_num_splits):
        dense = lambda name: nn.Dense(self.d_model, use_bias=False,
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      kernel_init=nn.initializers.xavier_uniform(),
                                      name=name)
        q = dense("q_proj")(source)
        k = dense("k_proj")(target)
        v = dense("v_proj")(target)

        if attn_num_splits > 1:
            message = _split_window_attention(
                q, k, v, attn_num_splits, self.with_shift, h, w, attn_mask,
                mesh=self.mesh, model_axis=self.model_axis)
        elif _seq_parallel(self.mesh, self.model_axis):
            from ..parallel.sequence import ring_softmax_matmul
            message = ring_softmax_matmul(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), self.mesh,
                axis=self.model_axis).astype(v.dtype)
        else:
            message = _full_attention(q, k, v)

        message = dense("merge")(message)
        message = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm1")(message)

        if not self.no_ffn:
            y = jnp.concatenate([source, message], axis=-1)
            y = nn.Dense(self.d_model * 2 * self.ffn_dim_expansion,
                         use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.xavier_uniform())(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.xavier_uniform())(y)
            message = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   name="norm2")(y)
        return source + message


class TransformerBlock(nn.Module):
    """self-attn + cross-attn-ffn; `transformer.py:188-241`."""
    d_model: int = 128
    ffn_dim_expansion: int = 4
    with_shift: bool = False
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None
    model_axis: str = "model"

    @nn.compact
    def __call__(self, source, target, h, w, attn_mask, attn_num_splits):
        source = TransformerLayer(
            self.d_model, no_ffn=True, with_shift=self.with_shift,
            ffn_dim_expansion=self.ffn_dim_expansion, dtype=self.dtype,
            mesh=self.mesh, model_axis=self.model_axis,
            name="self_attn")(source, source, h, w, attn_mask,
                              attn_num_splits)
        source = TransformerLayer(
            self.d_model, with_shift=self.with_shift,
            ffn_dim_expansion=self.ffn_dim_expansion, dtype=self.dtype,
            mesh=self.mesh, model_axis=self.model_axis,
            name="cross_attn_ffn")(source, target, h, w, attn_mask,
                                   attn_num_splits)
        return source


class FeatureTransformer(nn.Module):
    """6 interleaved blocks over the concatenated pair; `transformer.py:244-322`."""
    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None
    model_axis: str = "model"

    @nn.compact
    def __call__(self, feature0, feature1, attn_num_splits: int):
        b, h, w, c = feature0.shape
        f0 = feature0.reshape(b, h * w, c)
        f1 = feature1.reshape(b, h * w, c)

        if attn_num_splits > 1:
            wh, ww = h // attn_num_splits, w // attn_num_splits
            attn_mask = shift_window_attn_mask(h, w, wh, ww, wh // 2, ww // 2)
        else:
            attn_mask = None

        concat0 = jnp.concatenate([f0, f1], axis=0)  # [2B, L, C]
        concat1 = jnp.concatenate([f1, f0], axis=0)
        for i in range(self.num_layers):
            concat0 = TransformerBlock(
                self.d_model, self.ffn_dim_expansion,
                with_shift=(i % 2 == 1), dtype=self.dtype,
                mesh=self.mesh, model_axis=self.model_axis,
                name=f"block_{i}")(concat0, concat1, h, w, attn_mask,
                                   attn_num_splits)
            half0, half1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([half1, half0], axis=0)

        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


class FeatureFlowAttention(nn.Module):
    """Flow propagation: q/k = feature0, v = flow; `transformer.py:325-409`.

    With a (data, model) mesh the global branch runs the sequence-parallel
    ring (`parallel/sequence.py`), token axis sharded on ``model_axis``."""
    in_channels: int = 128
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None
    model_axis: str = "model"

    @nn.compact
    def __call__(self, feature0, flow, local_window_attn: bool = False,
                 local_window_radius: int = 1):
        b, h, w, c = feature0.shape
        q_proj = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="q_proj")
        k_proj = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                          kernel_init=nn.initializers.xavier_uniform(),
                          name="k_proj")
        query = q_proj(feature0.reshape(b, h * w, c))

        if not local_window_attn:
            # NOTE: key is a projection of the QUERY here, faithfully
            # mirroring the reference's (documented) quirk at
            # `transformer.py:357-364` — the local-window branch below
            # projects feature0 directly (`transformer.py:389`).
            key = k_proj(query)
            value = flow.reshape(b, h * w, 2)
            if _seq_parallel(self.mesh, self.model_axis):
                from ..parallel.sequence import ring_softmax_matmul
                out = ring_softmax_matmul(query.astype(jnp.float32),
                                          key.astype(jnp.float32),
                                          value.astype(jnp.float32),
                                          self.mesh, axis=self.model_axis)
                return out.reshape(b, h, w, 2)
            if _use_flash():
                out = flash_softmax_matmul(query.astype(jnp.bfloat16),
                                           key.astype(jnp.bfloat16), value,
                                           interpret=_flash_interpret())
                return out.reshape(b, h, w, 2)
            scores = jnp.einsum("blc,bmc->blm", query, key,
                                preferred_element_type=jnp.float32) / (c ** 0.5)
            prob = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("blm,bmd->bld", prob, value,
                             preferred_element_type=jnp.float32)
            return out.reshape(b, h, w, 2)

        # local window attention (`transformer.py:376-409`); key here is
        # k_proj(feature0), not k_proj(query). ks^2 shifted dot/MAC pairs
        # instead of conv_general_dilated_patches: the patches tensor
        # [B, C, ks^2, H, W] is ks^2 x the feature map (~200 MB at the
        # 1/4-res refinement scale) while the shifted form keeps peak
        # memory at one padded map; window order matches the patches
        # op's channel-major (ky, kx) layout (zero padding both ways).
        ks = 2 * local_window_radius + 1
        r = local_window_radius
        key = k_proj(feature0.reshape(b, h * w, c))
        key_map = key.reshape(b, h, w, c)
        kp = jnp.pad(key_map, ((0, 0), (r, r), (r, r), (0, 0)))
        fp = jnp.pad(flow, ((0, 0), (r, r), (r, r), (0, 0)))

        q = query.reshape(b, h, w, c)
        scores = jnp.stack(
            [jnp.einsum("bhwc,bhwc->bhw", q,
                        kp[:, dy:dy + h, dx:dx + w, :],
                        preferred_element_type=jnp.float32)
             for dy in range(ks) for dx in range(ks)],
            axis=-1) / (c ** 0.5)                        # [B, H, W, ks^2]
        prob = jax.nn.softmax(scores, axis=-1)
        out = jnp.zeros((b, h, w, 2), jnp.float32)
        for k, (dy, dx) in enumerate((dy, dx) for dy in range(ks)
                                     for dx in range(ks)):
            out = out + prob[..., k:k + 1] * \
                fp[:, dy:dy + h, dx:dx + w, :].astype(jnp.float32)
        return out


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------

def global_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray,
                               pred_bidir_flow: bool = False,
                               mesh: Optional[Mesh] = None,
                               model_axis: str = "model"
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global matching: softmax(corr) @ grid - grid; `matching.py:7-36`.

    feature0/1: [B, H, W, C]. Returns (flow [B, H, W, 2], prob).
    With a >1-sized ``model_axis`` mesh the computation runs
    sequence-parallel (ring over ICI) with the token axis sharded.
    """
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    grid = jnp.moveaxis(pixel_grid(h, w), 0, -1).reshape(h * w, 2)

    if _seq_parallel(mesh, model_axis):
        # sequence-parallel ring matching: token axis sharded on the mesh,
        # per-step softmax accumulation streamed over ICI ppermute
        # (`parallel/sequence.py`; SURVEY.md §5.7)
        from ..parallel.sequence import ring_softmax_matmul
        gv = jnp.broadcast_to(grid[None], (b, h * w, 2))
        f0_32 = f0.astype(jnp.float32)
        f1_32 = f1.astype(jnp.float32)
        corr_fwd = ring_softmax_matmul(f0_32, f1_32, gv, mesh,
                                       axis=model_axis)
        if pred_bidir_flow:
            corr_bwd = ring_softmax_matmul(f1_32, f0_32, gv, mesh,
                                           axis=model_axis)
            correspondence = jnp.concatenate([corr_fwd, corr_bwd], axis=0)
            b = b * 2
        else:
            correspondence = corr_fwd
        flow = correspondence.reshape(b, h, w, 2) - grid.reshape(1, h, w, 2)
        return flow, None

    if _use_flash():
        # streaming softmax @ grid: the [L, L] volume never materializes.
        # bf16 operands (f32 accumulation) only on this TPU kernel path —
        # the dense path below stays in the input dtype so CPU parity runs
        # are exact (reference computes matching in f32, `matching.py:15`).
        f0 = f0.astype(jnp.bfloat16)
        f1 = f1.astype(jnp.bfloat16)
        gv = jnp.broadcast_to(grid[None], (b, h * w, 2))
        corr_fwd = flash_softmax_matmul(f0, f1, gv,
                                        interpret=_flash_interpret())
        if pred_bidir_flow:
            corr_bwd = flash_softmax_matmul(f1, f0, gv,
                                            interpret=_flash_interpret())
            correspondence = jnp.concatenate([corr_fwd, corr_bwd], axis=0)
            b = b * 2
        else:
            correspondence = corr_fwd
        flow = correspondence.reshape(b, h, w, 2) - grid.reshape(1, h, w, 2)
        return flow, None

    corr = jnp.einsum("blc,bmc->blm", f0, f1,
                      preferred_element_type=jnp.float32) / (c ** 0.5)
    if pred_bidir_flow:
        corr = jnp.concatenate([corr, jnp.swapaxes(corr, 1, 2)], axis=0)
        b = b * 2
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("blm,md->bld", prob, grid,
                                preferred_element_type=jnp.float32)
    flow = correspondence.reshape(b, h, w, 2) - grid.reshape(1, h, w, 2)
    return flow, prob


def local_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray,
                              local_radius: int
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed matching; `matching.py:39-83`."""
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 1
    coords = jnp.moveaxis(pixel_grid(h, w), 0, -1)  # [H, W, 2]

    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    window = jnp.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1)  # [K2, 2]

    sample = coords.reshape(1, h * w, 1, 2) + window[None, None]
    valid = ((sample[..., 0] >= 0) & (sample[..., 0] < w) &
             (sample[..., 1] >= 0) & (sample[..., 1] < h))

    # k^2 shifted dot-reduces instead of patch extraction: the patches
    # tensor [B, C*k^2, H, W] is ~C x larger than the output and blows HBM at
    # 1/4 res (refinement scale); shifted products keep peak memory at the
    # [B, L, k^2] output + one padded feature map, and XLA fuses each
    # slice+dot. Features stay in the model compute dtype (bf16 under
    # mixed precision — halves the k^2 full-map reads) with f32-accumulated
    # contractions, the same numerics class as the global-matching einsum.
    # Measured neutral on the refine-step wall clock (the chain overlaps
    # MXU work) but halves its peak HBM traffic. Window order matches
    # `window` above (dy-major).
    f0 = feature0
    f1p = jnp.pad(feature1, ((0, 0), (r, r), (r, r), (0, 0)))
    corr = jnp.stack(
        [jnp.einsum("bhwc,bhwc->bhw", f0, jax.lax.dynamic_slice(
            f1p, (0, r + dy, r + dx, 0), (b, h, w, c)),
            preferred_element_type=jnp.float32)
         for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
        axis=-1).reshape(b, h * w, k * k) / (c ** 0.5)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)  # [B, L, K2]
    correspondence = jnp.einsum("blk,blkd->bld", prob,
                                jnp.broadcast_to(sample, (b, h * w, k * k, 2)),
                                preferred_element_type=jnp.float32)
    flow = correspondence.reshape(b, h, w, 2) - coords[None]
    return flow, prob


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------

def normalize_img(img0: jnp.ndarray, img1: jnp.ndarray):
    """ImageNet normalization of [0,255] NHWC images; `gmflow/utils.py:55-63`."""
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    return (img0 / 255.0 - mean) / std, (img1 / 255.0 - mean) / std


class GMFlow(nn.Module):
    """Adjusted GMFlow; forward contract mirrors `gmflow.py:92-170`.

    Call with NHWC [0,255] images and the per-scale recipe lists:
      attn_splits_list / corr_radius_list / prop_radius_list
    (e.g. [2], [-1], [-1] for 1-scale; [2, 8], [-1, 4], [-1, 1] with refine).
    Returns dict(flow_preds=[...]) with upsampled [B, H, W, 2] flows.
    """
    num_scales: int = 1
    upsample_factor: int = 8
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    dtype: Dtype = jnp.float32
    # sequence parallelism (SURVEY.md §5.7): with a (data, model) mesh whose
    # model axis is >1, global matching / full attention / global flow
    # propagation run as a ring over the sharded token axis
    mesh: Optional[Mesh] = None
    model_axis: str = "model"

    @nn.compact
    def __call__(self, img0, img1,
                 attn_splits_list: Sequence[int] = (2,),
                 corr_radius_list: Sequence[int] = (-1,),
                 prop_radius_list: Sequence[int] = (-1,),
                 pred_bidir_flow: bool = False,
                 training: bool = True):
        assert len(attn_splits_list) == self.num_scales
        img0, img1 = normalize_img(img0, img1)

        # backbone over the stacked pair (`gmflow.py:50-65`)
        concat = jnp.concatenate([img0, img1], axis=0).astype(self.dtype)
        features = CNNEncoder(self.feature_channels,
                              num_output_scales=self.num_scales,
                              dtype=self.dtype, name="backbone")(concat)
        features = features[::-1]  # low -> high resolution

        transformer = FeatureTransformer(
            self.num_transformer_layers, self.feature_channels,
            self.ffn_dim_expansion, dtype=self.dtype, mesh=self.mesh,
            model_axis=self.model_axis, name="transformer")
        flow_attn = FeatureFlowAttention(self.feature_channels,
                                         dtype=self.dtype, mesh=self.mesh,
                                         model_axis=self.model_axis,
                                         name="feature_flow_attn")

        upsampler = nn.Sequential([
            Conv(256, (3, 3), dtype=self.dtype),
            nn.relu,
            Conv(self.upsample_factor ** 2 * 9, (1, 1), dtype=self.dtype),
        ])

        flow_preds: List[jnp.ndarray] = []
        flow = None

        for scale_idx in range(self.num_scales):
            feat = features[scale_idx]
            feature0, feature1 = jnp.split(feat.astype(jnp.float32), 2, axis=0)

            if pred_bidir_flow and scale_idx > 0:
                feature0, feature1 = (
                    jnp.concatenate([feature0, feature1], axis=0),
                    jnp.concatenate([feature1, feature0], axis=0))

            upsample_factor = self.upsample_factor * (
                2 ** (self.num_scales - 1 - scale_idx))

            if scale_idx > 0:
                # F.interpolate(scale_factor=2, align_corners=True) * 2
                # (`gmflow.py:122`)
                b_, h_, w_, _ = flow.shape
                flow = resize_bilinear_align_corners(flow, 2 * h_,
                                                     2 * w_) * 2.0

            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                feature1 = flow_warp(feature1.transpose(0, 3, 1, 2),
                                     flow.transpose(0, 3, 1, 2)
                                     ).transpose(0, 2, 3, 1)

            attn_splits = attn_splits_list[scale_idx]
            corr_radius = corr_radius_list[scale_idx]
            prop_radius = prop_radius_list[scale_idx]

            feature0, feature1 = feature_add_position(
                feature0, feature1, attn_splits, self.feature_channels)

            feature0, feature1 = transformer(
                feature0.astype(self.dtype), feature1.astype(self.dtype),
                attn_num_splits=attn_splits)
            feature0 = feature0.astype(jnp.float32)
            feature1 = feature1.astype(jnp.float32)

            if corr_radius == -1:
                flow_pred = global_correlation_softmax(
                    feature0, feature1, pred_bidir_flow,
                    mesh=self.mesh, model_axis=self.model_axis)[0]
            else:
                flow_pred = local_correlation_softmax(
                    feature0, feature1, corr_radius)[0]

            flow = flow + flow_pred if flow is not None else flow_pred

            if training:
                b_, h_, w_, _ = flow.shape
                bil = resize_bilinear_align_corners(
                    flow, upsample_factor * h_,
                    upsample_factor * w_) * upsample_factor
                flow_preds.append(bil)

            if pred_bidir_flow and scale_idx == 0:
                feature0 = jnp.concatenate([feature0, feature1], axis=0)
            flow = flow_attn(feature0.astype(self.dtype),
                             jax.lax.stop_gradient(flow),
                             local_window_attn=prop_radius > 0,
                             local_window_radius=prop_radius)

            if training and scale_idx < self.num_scales - 1:
                b_, h_, w_, _ = flow.shape
                bil = resize_bilinear_align_corners(
                    flow, upsample_factor * h_,
                    upsample_factor * w_) * upsample_factor
                flow_preds.append(bil)

            if scale_idx == self.num_scales - 1:
                concat_fm = jnp.concatenate(
                    [flow.astype(self.dtype), feature0.astype(self.dtype)],
                    axis=-1)
                mask = upsampler(concat_fm).astype(jnp.float32)
                flow_up = convex_upsample(flow, mask,
                                          factor=self.upsample_factor)
                flow_preds.append(flow_up)

        return {"flow_preds": flow_preds}
