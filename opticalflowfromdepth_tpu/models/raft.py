"""RAFT (adjusted) — TPU-native flax implementation (M1).

Re-design of `adjusted_RAFT/core/raft.py` + `update.py` + `extractor.py`:
  * feature encoder (instance norm) + context encoder (batch norm) to 1/8 res;
  * all-pairs 4-level correlation pyramid (or on-demand lookup);
  * iterative SepConvGRU update with convex upsampling.

TPU-first choices: NHWC layout; encoders/GRU run in a configurable compute
dtype (bfloat16 by default under mixed precision — replacing the reference's
torch.cuda.amp autocast `raft.py:99,110,127`), while correlation features and
flow arithmetic stay float32 (the reference also forces fmaps to float
`raft.py:102-103`). Iterations are a compile-time-unrolled loop over static
``iters`` (XLA fuses each step; coords are detached between iterations via
stop_gradient exactly like `raft.py:123`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import pixel_grid
from ..ops.correlation import CorrPyramid, on_demand_corr
from ..ops.sampling import resize_bilinear_align_corners
from .layers import BasicEncoder, Conv, SmallEncoder

Dtype = Any


def coords_grid(b: int, h: int, w: int) -> jnp.ndarray:
    """[B, H, W, 2] identity coords (x, y); `core/utils/utils.py:74-77`."""
    g = jnp.moveaxis(pixel_grid(h, w), 0, -1)
    return jnp.broadcast_to(g[None], (b, h, w, 2))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8x align-corners bilinear upsample of [B, H, W, 2] flow, scaled by 8.

    Exactly `core/utils/utils.py:80-83` (F.interpolate align_corners=True);
    used only by the small model path.
    """
    b, h, w, _ = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, 8 * h, 8 * w)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8,
                    dtype: Dtype = jnp.float32,
                    pixel_shuffle: bool = True) -> jnp.ndarray:
    """Convex-combination upsampling; `raft.py:72-83`.

    flow: [B, H, W, 2]; mask: [B, H, W, 9*factor^2] -> [B, f*H, f*W, 2].
    ``dtype`` is the combination compute dtype: float32 by default; the
    bf16 training path passes bfloat16 — the reference's AMP autocast
    covers its upsample too (`raft.py:127`), and the ~0.4%-relative flow
    rounding is inside the L1 training-loss noise floor.

    TPU note (r5, from a device trace): the earlier einsum-over-patches
    formulation spent ~15 ms/step (368x496 bs4, 12 iters) materializing a
    [B, H, W, 9, 2] patches tensor — 9 slice copies + a concatenate in a
    T(2,128) layout that uses 2 of 128 lanes. This version never builds
    patches: softmax runs on the [B, H, W, 9, ff] mask and the output is
    9 shifted multiply-accumulates, all elementwise and fusable. Tap
    order (ky, kx) row-major with zero padding matches the reference's
    F.unfold (`raft.py:76-78`) exactly, so ported checkpoints reproduce
    border behavior.
    """
    b, h, w, _ = flow.shape
    f = factor
    ff = f * f
    mask = mask.reshape(b, h, w, 9, ff)
    mask = jax.nn.softmax(mask.astype(jnp.float32), axis=3)
    cdtype = jnp.float32 if dtype == jnp.float32 else dtype
    mask = mask.astype(cdtype)

    fp = jnp.pad((f * flow).astype(cdtype),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    up = jnp.zeros((b, h, w, ff, 2), cdtype)
    for k, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        # [B, H, W, ff, 1] * [B, H, W, 1, 2] — elementwise, no gather
        up = up + mask[:, :, :, k, :, None] * \
            fp[:, dy:dy + h, dx:dx + w, None, :]
    if not pixel_shuffle:
        return up                       # blocked layout [B, h, w, f*f, 2]
    return unblock_pixels(up, f)


def unblock_pixels(up: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Blocked [B, h, w, f*f, C] -> full-res [B, h*f, w*f, C]
    (depth-to-space; the inverse of :func:`block_pixels`)."""
    b, h, w, ff, c = up.shape
    f = factor
    up = up.reshape(b, h, w, f, f, c)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # [B, h, f, w, f, C]
    return up.reshape(b, h * f, w * f, c)


def block_pixels(x: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Full-res [B, H, W, ...] -> blocked [B, h, w, f*f, ...]
    (space-to-depth). Training supervision runs in this layout: a device
    trace showed ~10 ms/step of pure relayout when every GRU iteration's
    upsampled flow crossed the pixel-shuffle boundary; instead the ground
    truth and valid mask are blocked ONCE per step, and the per-iteration
    L1/EPE reductions see the same value multiset in blocked order."""
    b, hh, ww = x.shape[:3]
    f = factor
    rest = x.shape[3:]
    x = x.reshape((b, hh // f, f, ww // f, f) + rest)
    x = jnp.moveaxis(x, 2, 3)            # [B, h, w, f, f, ...]
    return x.reshape((b, hh // f, ww // f, f * f) + rest)


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(x))
        return Conv(2, (3, 3), dtype=self.dtype)(x)


class ConvGRU(nn.Module):
    """Plain 3x3 ConvGRU (small model); `update.py:16-31`."""
    hidden_dim: int = 96
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(hx))
        r = nn.sigmoid(Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(hx))
        q = nn.tanh(Conv(self.hidden_dim, (3, 3), dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Separable 1x5/5x1 ConvGRU; `update.py:33-60`."""
    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for kernel in ((1, 5), (5, 1)):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(Conv(self.hidden_dim, kernel, dtype=self.dtype)(hx))
            r = nn.sigmoid(Conv(self.hidden_dim, kernel, dtype=self.dtype)(hx))
            q = nn.tanh(Conv(self.hidden_dim, kernel, dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """`update.py:79-97`."""
    corr_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, (1, 1), dtype=self.dtype)(corr))
        cor = nn.relu(Conv(192, (3, 3), dtype=self.dtype)(cor))
        flo = nn.relu(Conv(128, (7, 7), dtype=self.dtype)(flow))
        flo = nn.relu(Conv(64, (3, 3), dtype=self.dtype)(flo))
        out = nn.relu(Conv(126, (3, 3), dtype=self.dtype)(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128ch


class SmallMotionEncoder(nn.Module):
    """`update.py:62-77`."""
    corr_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(96, (1, 1), dtype=self.dtype)(corr))
        flo = nn.relu(Conv(64, (7, 7), dtype=self.dtype)(flow))
        flo = nn.relu(Conv(32, (3, 3), dtype=self.dtype)(flo))
        out = nn.relu(Conv(80, (3, 3), dtype=self.dtype)(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82ch


class BasicUpdateBlock(nn.Module):
    """`update.py:114-136`."""
    corr_planes: int
    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_planes, dtype=self.dtype)(
            flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype)(net, x)
        delta = FlowHead(256, dtype=self.dtype)(net)
        mask = Conv(64 * 9, (1, 1), dtype=self.dtype)(
            nn.relu(Conv(256, (3, 3), dtype=self.dtype)(net)))
        return net, 0.25 * mask, delta


class SmallUpdateBlock(nn.Module):
    """`update.py:99-112` — no upsample mask."""
    corr_planes: int
    hidden_dim: int = 96
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(self.corr_planes, dtype=self.dtype)(
            flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype)(net, x)
        delta = FlowHead(128, dtype=self.dtype)(net)
        return net, None, delta


class RAFT(nn.Module):
    """Adjusted RAFT; forward contract mirrors `raft.py:86-144`.

    Call: ``flows = model(image1, image2, iters=12)`` with images
    [B, H, W, 3] in [0, 255] (H, W divisible by 8). Returns the list of
    per-iteration upsampled flow predictions [B, H, W, 2]; with
    ``test_mode=True`` returns (low_res_flow, final_up_flow).
    """
    small: bool = False
    dropout: float = 0.0
    alternate_corr: bool = False
    corr_levels: int = 4
    dtype: Dtype = jnp.float32  # compute dtype for encoders/GRU
    # correlation implementation:
    #   "pyramid" — XLA indicator-matmul lookup over a prebuilt volume
    #               (bit-matched to the torch oracle; works everywhere);
    #   "fused"   — Pallas kernel with hand-written backward
    #               (ops/fused_corr.py): the volume and its gradient live
    #               only in VMEM tiles; interpret-mode off-TPU.
    corr_impl: str = "pyramid"
    # training-only: return per-iteration flow predictions in the BLOCKED
    # [B, h, w, 64, 2] layout (see block_pixels) — callers must block the
    # ground truth/valid the same way. No effect in test_mode / on the
    # small model (whose upflow8 path has no block structure).
    blocked_supervision: bool = False
    # backward rematerialization of the GRU scan body:
    #   "none" — no remat (default; fastest: 167 vs 202 ms/step at
    #            368x496 bs4 bf16 12 iters, ~1 GB of saved activations);
    #   "dots" — save dot_general outputs only (corr lookups), recompute
    #            convs/elementwise;
    #   "full" — recompute everything (O(1) activation memory in iters —
    #            use for large-batch / long-iteration runs).
    remat: str = "none"
    # lax.scan unroll factor for the GRU iterations. Measured (r5, v5e,
    # 368x496 bs4 bf16 12 iters): no throughput effect (167.0 ms rolled,
    # 167.2 unroll=4, 169.9 unroll=12) — XLA's per-iteration schedule is
    # already the steady state; kept as a knob for future shapes.
    unroll: int = 1

    @property
    def corr_radius(self) -> int:
        return 3 if self.small else 4

    @nn.compact
    def __call__(self, image1, image2, iters: int = 12,
                 flow_init: Optional[jnp.ndarray] = None,
                 test_mode: bool = False, train: bool = True):
        hdim = 96 if self.small else 128
        cdim = 64 if self.small else 128
        radius = self.corr_radius
        corr_planes = self.corr_levels * (2 * radius + 1) ** 2

        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0
        image1 = image1.astype(self.dtype)
        image2 = image2.astype(self.dtype)

        enc = SmallEncoder if self.small else BasicEncoder
        fdim = 128 if self.small else 256
        # shared feature net applied to the stacked pair (`raft.py:100`)
        fnet = enc(output_dim=fdim, norm_fn="instance", dropout=self.dropout,
                   dtype=self.dtype, name="fnet")
        both = fnet(jnp.concatenate([image1, image2], axis=0), train)
        fmap1, fmap2 = jnp.split(both.astype(jnp.float32), 2, axis=0)

        cnet_norm = "none" if self.small else "batch"
        cnet = enc(output_dim=hdim + cdim, norm_fn=cnet_norm,
                   dropout=self.dropout, dtype=self.dtype, name="cnet")(
                       image1, train)
        net, inp = jnp.split(cnet, [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        b, h8, w8, _ = fmap1.shape
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords_grid(b, h8, w8)
        if flow_init is not None:
            coords1 = coords1 + flow_init

        if self.alternate_corr:
            corr_fn = lambda c: on_demand_corr(
                fmap1, fmap2, c, self.corr_levels, radius, dtype=self.dtype)
        elif self.corr_impl == "fused":
            from ..ops.fused_corr import (corr_levels_cat,
                                          fused_corr_lookup_cat)
            interp = jax.default_backend() != "tpu"
            # packed pyramid built ONCE (hoisted out of the GRU scan; its
            # VJP also runs once — the scan accumulates feature-sized
            # d_f2cat constant-cotangents)
            f2cat = corr_levels_cat(fmap2, self.corr_levels, self.dtype)
            f1flat = fmap1.astype(self.dtype).reshape(
                fmap1.shape[0], -1, fmap1.shape[-1])
            corr_fn = lambda c: fused_corr_lookup_cat(
                f1flat, f2cat, c.reshape(c.shape[0], -1, 2),
                fmap1.shape[1], fmap1.shape[2], self.corr_levels, radius,
                256, interp).reshape(c.shape[0], c.shape[1], c.shape[2], -1)
        else:
            pyramid = CorrPyramid(fmap1, fmap2, self.corr_levels, radius,
                                  dtype=self.dtype)
            corr_fn = pyramid

        update = (SmallUpdateBlock if self.small else BasicUpdateBlock)(
            corr_planes, hidden_dim=hdim, dtype=self.dtype, name="update_block")

        # GRU iterations as lax.scan + remat (`raft.py:122-139`): the
        # round-2 build unrolled the 12/24 iterations in Python, inflating
        # XLA compile time to minutes for the training step; scanning
        # compiles the body once and remat drops per-iteration activations
        # (recomputed in the backward) so memory is O(1) in iters.
        # variable_broadcast shares the update weights across iterations
        # with unchanged parameter naming (checkpoint ports depend on it).
        has_mask = not self.small
        # the final mask is threaded through the carry only when test_mode
        # needs it — an empty-channel placeholder otherwise, so training
        # pays no extra per-iteration carry traffic (26 MB/iter at bs4)
        mask_ch = 64 * 9 if (has_mask and test_mode) else 0

        def body(update_mod, carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)  # `raft.py:123`
            corr = corr_fn(coords1).astype(self.dtype)
            flow = (coords1 - coords0).astype(self.dtype)
            net, up_mask, delta_flow = update_mod(net, inp, corr, flow)
            coords1 = coords1 + delta_flow.astype(jnp.float32)
            mask32 = (up_mask.astype(jnp.float32) if mask_ch
                      else jnp.zeros((b, h8, w8, 0), jnp.float32))
            if test_mode:
                # only the FINAL prediction is returned; skip the 11 dead
                # per-iteration upsamples and carry the last mask out of
                # the scan — the final upsample runs once, in float32, so
                # submission-grade flows are not quantized to bfloat16 by
                # the training-precision stack (ADVICE r4: the reference
                # evaluates in fp32 while its AMP covers training only)
                return (net, coords1, mask32), jnp.zeros((0,), self.dtype)
            if up_mask is None:
                flow_up = upflow8(coords1 - coords0)
            else:
                flow_up = convex_upsample(
                    coords1 - coords0, up_mask.astype(jnp.float32),
                    dtype=self.dtype,
                    pixel_shuffle=not self.blocked_supervision)
            # stack the per-iteration supervision targets in the compute
            # dtype (the loss upcasts); halves the 12x full-res ys traffic
            return (net, coords1, mask32), flow_up.astype(self.dtype)

        if self.remat not in ("none", "dots", "full"):
            raise ValueError(f"RAFT.remat must be none/dots/full, "
                             f"got {self.remat!r}")
        if self.remat == "none":
            scan_body = body
        else:
            policy = (None if self.remat == "full" else
                      jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
            scan_body = nn.remat(body, prevent_cse=False, policy=policy)
        scan = nn.scan(scan_body,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       length=iters,
                       unroll=max(1, min(self.unroll, iters)))
        mask0 = jnp.zeros((b, h8, w8, mask_ch), jnp.float32)
        (net, coords1, mask), flow_ups = scan(
            update, (net, coords1, mask0), None)

        if test_mode:
            flow_lr = coords1 - coords0
            if has_mask:
                flow_up = convex_upsample(flow_lr, mask,
                                          dtype=jnp.float32)
            else:
                flow_up = upflow8(flow_lr)
            return flow_lr, flow_up
        return [flow_ups[i] for i in range(iters)]
