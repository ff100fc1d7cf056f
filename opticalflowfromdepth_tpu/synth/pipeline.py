"""The data-synthesis engine (S7): depth -> supervised optical-flow pairs.

Jit-compiled, fully on-device re-design of the reference's
``PreprocessPlusAugment`` (`/root/reference/preprocess.py:329-506`) and
``augment_flow`` (`preprocess.py:107-182`). The reference round-trips to the
CPU for every cv2.inpaint call (~130 warps/image); here the whole per-image
program is one XLA computation.

Per source image the engine produces:
  * a 5-pair "group": (0->1 virtual stereo, 1->2 and 0->3 virtual motion,
    0->2 and 1->3 composed flows), each pair = (imgA, depthA, imgB, depthB,
    flowAB, back_flowAB) — 12 channels (`preprocess.py:427-432`);
  * 12 augmentations per pair (types [0,5,6,7,1,5,6,7,2,5,6,7],
    `preprocess.py:454`), each yielding two supervised sets (augment side A /
    side B, `preprocess.py:142-147,177-182`).

Output schema (fixes the reference's npz drift, SURVEY.md §2.3 D2): explicit
keys img0/img1/flow/back_flow/depth0/depth1 + augment_flow_type + side.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import convert, special_flow
from ..core.depth_utils import fix_warped_depth, normalize_depth
from ..core.rng import get_random
from ..ops.forward_warp import (back_flow, concat_flow, forward_warp,
                                forward_warp_flip)
from ..ops.inpaint import inpaint

AUGMENT_SCHEDULE = (0, 5, 6, 7, 1, 5, 6, 7, 2, 5, 6, 7)  # `preprocess.py:454`


class Pair(NamedTuple):
    """One supervised training pair (12 channels in the reference layout)."""
    img_a: jnp.ndarray        # [3, H, W]
    depth_a: jnp.ndarray      # [1, H, W]
    img_b: jnp.ndarray        # [3, H, W]
    depth_b: jnp.ndarray      # [1, H, W]
    flow_ab: jnp.ndarray      # [2, H, W]
    back_flow_ab: jnp.ndarray # [2, H, W]

    def stacked(self) -> jnp.ndarray:
        return jnp.concatenate(self, axis=0)  # [12, H, W]


def _warp_pack(pack: jnp.ndarray, flow: jnp.ndarray, depth: jnp.ndarray):
    out, valid, collision = forward_warp(pack, flow, depth)
    return out, valid, collision


def synthesize_group(key: jax.Array, img0: jnp.ndarray, depth0: jnp.ndarray,
                     is_stereo: bool = False) -> Tuple[Pair, ...]:
    """Build the 5-pair group from one (image, depth|disparity) sample.

    Args:
      key:   PRNG key (fold_in per image for determinism, `preprocess.py:555`).
      img0:  [3, H, W] image in [0, 255].
      depth0: [1, H, W] depth (ReDWeb path) or disparity (DIML/stereo path).

    Mirrors `preprocess.py:341-432` step by step.
    """
    k_disp, k_mot12, _ = jax.random.split(key, 3)

    if is_stereo:
        img0_depth = convert.disparity_to_depth(depth0)
    else:
        img0_depth = depth0
    img0_depth = normalize_depth(img0_depth)

    # --- 0 -> 1: virtual stereo (horizontal flow) --------------------------
    disp0 = convert.depth_to_disparity(k_disp, img0_depth)
    flow01 = convert.disparity_to_flow(disp0, random_sign=False)
    pack = jnp.concatenate([img0, img0_depth, flow01 * -1.0], axis=0)
    out, img1_valid, coll = _warp_pack(pack, flow01, img0_depth)
    img1 = out[0:3] * img1_valid
    img1_depth = fix_warped_depth(out[3:4] * img1_valid)
    back_flow01 = out[4:6] * img1_valid
    img1 = inpaint(img1, img1_valid, coll)

    # --- 1 -> 2: random virtual camera motion ------------------------------
    flow12, T1 = convert.depth_to_random_flow(k_mot12, img1_depth)
    pack = jnp.concatenate([img1, img1_depth, flow12 * -1.0, img1_valid], 0)
    out, valid, coll = _warp_pack(pack, flow12, img1_depth)
    img2_valid = valid * out[6:7]
    img2 = out[0:3] * img2_valid
    img2_depth = out[3:4] * img2_valid
    back_flow12 = out[4:6] * img2_valid
    img2 = inpaint(img2, img2_valid, coll)
    img2_depth = fix_warped_depth(img2_depth)

    # --- 0 -> 3: same motion from frame 0 (`preprocess.py:385`) ------------
    flow03, _ = convert.depth_to_random_flow(k_mot12, img0_depth, T1=T1)
    pack = jnp.concatenate([img0, img0_depth, flow03 * -1.0], axis=0)
    out, img3_valid, coll = _warp_pack(pack, flow03, img0_depth)
    img3 = out[0:3] * img3_valid
    img3_depth = out[3:4] * img3_valid
    back_flow03 = out[4:6] * img3_valid
    img3 = inpaint(img3, img3_valid, coll)
    img3_depth = fix_warped_depth(img3_depth)

    # --- 0 -> 2: composed flow (`preprocess.py:400-412`) -------------------
    flow02, flow02_valid = concat_flow(flow01, back_flow01, flow12, img1_depth)
    pack = jnp.concatenate([img0, img0_depth, flow02 * -1.0, flow02_valid], 0)
    out, valid, coll = _warp_pack(pack, flow02, img0_depth)
    img2p_valid = valid * out[6:7]
    img2_prime = out[0:3] * img2p_valid
    img2_depth_prime = out[3:4] * img2p_valid
    back_flow02_prime = out[4:6] * img2p_valid
    img2_prime = inpaint(img2_prime, img2p_valid, coll)
    img2_depth_prime = fix_warped_depth(img2_depth_prime)

    # --- 1 -> 3: composed flow (`preprocess.py:414-425`) -------------------
    flow13, flow13_valid = concat_flow(back_flow01, flow01, flow03, img1_depth)
    flow13_valid = flow13_valid * img1_valid
    pack = jnp.concatenate([img1, img1_depth, flow13 * -1.0, flow13_valid], 0)
    out, valid, coll = _warp_pack(pack, flow13, img1_depth)
    img3p_valid = valid * out[6:7]
    img3_prime = out[0:3] * img3p_valid
    img3_depth_prime = out[3:4] * img3p_valid
    back_flow13_prime = out[4:6] * img3p_valid
    img3_prime = inpaint(img3_prime, img3p_valid, coll)
    img3_depth_prime = fix_warped_depth(img3_depth_prime)

    return (
        Pair(img0, img0_depth, img1, img1_depth, flow01, back_flow01),
        Pair(img1, img1_depth, img2, img2_depth, flow12, back_flow12),
        Pair(img0, img0_depth, img2_prime, img2_depth_prime, flow02,
             back_flow02_prime),
        Pair(img0, img0_depth, img3, img3_depth, flow03, back_flow03),
        Pair(img1, img1_depth, img3_prime, img3_depth_prime, flow13,
             back_flow13_prime),
    )


class AugmentedSets(NamedTuple):
    """Both supervised sets produced by one augmentation.

    set1 augments side A (img0), set2 augments side B (img1) —
    `preprocess.py:142-147` / `:177-182`. Channel layout of the saved
    tensors matches `preprocess.py:462-463`:
      set1 = [aug_img0(3), aug_depth0(1), flow(2), back_flow(2)]
      set2 = [flow(2), back_flow(2), aug_img1(3), aug_depth1(1)]
    """
    set1: jnp.ndarray  # [8, H, W]
    set2: jnp.ndarray  # [8, H, W]


def augment_pair(key: jax.Array, pair: Pair, augment_flow_type: int
                 ) -> AugmentedSets:
    """One augmentation of one pair; ``augment_flow_type`` is static.

    Geometric types (5 flip / 6 rotate / 7 shear) compose the special flow
    with the pair's true flow via ConcatFlow in both directions, forward-warp
    image+depth, inpaint, and recompute backward flows (`preprocess.py:116-147`).
    Photometric types (0 brightness / 1 channel shift / 2 grayscale) change
    only the images (`preprocess.py:150-182`).
    """
    t = int(augment_flow_type)
    img0, img0_depth, img1, img1_depth, flow01, back_flow01 = pair
    _, h, w = img0.shape

    if t >= 5:
        sf, bsf = special_flow.special_flow(key, h, w, t)

        # Three of the reference's six warps here go along the SAME special
        # flow (`preprocess.py:116-135`): the ConcatFlow of flow01, the
        # img0 pack and the img1 pack. The first two also share the depth
        # buffer (img0_depth), so ONE z-buffer sort resolves both payloads;
        # for flips the sort disappears entirely (exact mirror permutation,
        # `ops/forward_warp.py:forward_warp_flip`). Equality with the
        # straight-line composition is pinned by
        # `tests/test_data_layer.py::test_augment_pair_matches_straightline`.
        pack0 = jnp.concatenate([flow01, img0, img0_depth], axis=0)
        pack1 = jnp.concatenate([img1, img1_depth], axis=0)
        if t == 5:
            # the mirror axis must match the special flow the slow path
            # would warp along — special_flow.FLIP_HORIZONTAL makes the
            # coupling explicit (ADVICE r3)
            out0, v0, c0 = forward_warp_flip(
                pack0, img0_depth, horizontal=special_flow.FLIP_HORIZONTAL)
            out1, v1, c1 = forward_warp_flip(
                pack1, img1_depth, horizontal=special_flow.FLIP_HORIZONTAL)
        else:
            out0, v0, c0 = forward_warp(pack0, sf, img0_depth)
            out1, v1, c1 = forward_warp(pack1, sf, img1_depth)
        aug0_flow = (out0[0:2] + bsf) * v0      # == concat_flow(bsf, sf, ...)
        aug_img0 = inpaint(out0[2:5], v0, c0)
        aug_img0_depth = fix_warped_depth(out0[5:6])
        aug_img1 = inpaint(out1[0:3], v1, c1)
        aug_img1_depth = fix_warped_depth(out1[3:4])

        aug1_flow, _ = concat_flow(flow01, back_flow01, sf, img1_depth)
        back_aug0_flow, _ = back_flow(aug0_flow, aug_img0_depth)
        back_aug1_flow, _ = back_flow(aug1_flow, img0_depth)

        set1 = jnp.concatenate(
            [aug_img0, aug_img0_depth, aug0_flow, back_aug0_flow], axis=0)
        set2 = jnp.concatenate(
            [aug1_flow, back_aug1_flow, aug_img1, aug_img1_depth], axis=0)
        return AugmentedSets(set1, set2)

    if t >= 3:
        raise ValueError(
            "augment types 3-4 are dead branches in the reference "
            "(`preprocess.py:148-149`) and are not supported")

    # photometric
    if t >= 2:
        gray = jnp.array([[0.2989, 0.2989, 0.2989],
                          [0.5870, 0.5870, 0.5870],
                          [0.1140, 0.1140, 0.1140]], jnp.float32)
        def aug_fn(img):
            return jnp.einsum("chw,cd->dhw", img, gray)
    elif t >= 1:
        k_ch, k_sh = jax.random.split(key)
        channel = jax.random.randint(k_ch, (), 0, 3)
        shift_val = get_random(k_sh, 10.0, 15.0)
        shift = (jnp.arange(3) == channel).astype(jnp.float32) * shift_val
        def aug_fn(img):
            return img + shift[:, None, None]
    else:
        scale = get_random(key, 1.0, 0.0, random_sign=False)
        def aug_fn(img):
            return img * scale

    set1 = jnp.concatenate(
        [aug_fn(img0), img0_depth, flow01, back_flow01], axis=0)
    set2 = jnp.concatenate(
        [flow01, back_flow01, aug_fn(img1), img1_depth], axis=0)
    return AugmentedSets(set1, set2)


def group_tensor(pairs: Tuple[Pair, ...]) -> jnp.ndarray:
    """The 44-channel group tensor layout of `preprocess.py:437-440`."""
    p0, p1, p2, p3, p4 = pairs
    return jnp.concatenate([
        p0.img_a, p0.depth_a,          # img0, d0
        p0.img_b, p0.depth_b,          # img1, d1
        p1.img_b, p1.depth_b,          # img2, d2
        p3.img_b, p3.depth_b,          # img3, d3
        p2.img_b, p2.depth_b,          # img2', d2'
        p4.img_b, p4.depth_b,          # img3', d3'
        p0.flow_ab, p0.back_flow_ab,   # flow01, back01
        p1.flow_ab, p1.back_flow_ab,   # flow12, back12
        p2.flow_ab, p2.back_flow_ab,   # flow02, back02'
        p3.flow_ab, p3.back_flow_ab,   # flow03, back03
        p4.flow_ab, p4.back_flow_ab,   # flow13, back13'
    ], axis=0)


def synthesize_sample(key: jax.Array, img0: jnp.ndarray, depth0: jnp.ndarray,
                      is_stereo: bool = False) -> Dict[str, jnp.ndarray]:
    """Full per-image synthesis: group + all 5x12x2 augmented sets.

    Staged execution: ONE jitted group program plus one jitted
    shape-polymorphic-per-type vmapped augment program per distinct
    augment type (6 total) — compiled once per (H, W) and reused for every
    image. A single-jit variant of the whole 60-augmentation unroll would
    compile for minutes; this factorization keeps compile O(types) while
    every per-image FLOP still runs on device with batched dispatch.

    Returns a dict of stacked tensors:
      'group':   [44, H, W]
      'pairs':   [5, 12, H, W]
      'aug_set1','aug_set2': [5, 12, 8, H, W]
      'aug_types': [12] int32 (static schedule)
    """
    k_group, k_aug = jax.random.split(key)
    pairs = _jit_group(k_group, img0, depth0, is_stereo)

    # stack the 5 pairs on a leading axis for vmapped augmentation
    stacked = Pair(*(jnp.stack([getattr(p, f) for p in pairs])
                     for f in Pair._fields))

    n_pairs = len(pairs)
    set1 = [[None] * len(AUGMENT_SCHEDULE) for _ in range(n_pairs)]
    set2 = [[None] * len(AUGMENT_SCHEDULE) for _ in range(n_pairs)]
    for t in sorted(set(AUGMENT_SCHEDULE)):
        positions = [i for i, tt in enumerate(AUGMENT_SCHEDULE) if tt == t]
        keys = jnp.stack([
            jax.random.fold_in(jax.random.fold_in(k_aug, gi), ai)
            for gi in range(n_pairs) for ai in positions])
        rep = Pair(*(jnp.repeat(x, len(positions), axis=0)
                     for x in stacked))  # g-major ordering
        out = _jit_augment(t)(keys, rep)
        for j, (gi, ai) in enumerate(
                (g, a) for g in range(n_pairs) for a in positions):
            set1[gi][ai] = out.set1[j]
            set2[gi][ai] = out.set2[j]

    return {
        "group": group_tensor(pairs),
        "pairs": jnp.stack([p.stacked() for p in pairs]),
        "aug_set1": jnp.stack([jnp.stack(row) for row in set1]),
        "aug_set2": jnp.stack([jnp.stack(row) for row in set2]),
        "aug_types": jnp.asarray(AUGMENT_SCHEDULE, jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("is_stereo",))
def _jit_group(key, img0, depth0, is_stereo):
    return synthesize_group(key, img0, depth0, is_stereo)


@functools.lru_cache(maxsize=None)
def _jit_augment(t: int):
    return jax.jit(jax.vmap(lambda k, p: augment_pair(k, p, t)))


# ---------------------------------------------------------------------------
# packed variant: storage dtypes on device, photometric dedup
# ---------------------------------------------------------------------------

GEO_POSITIONS = tuple(i for i, t in enumerate(AUGMENT_SCHEDULE) if t >= 5)
PHO_POSITIONS = tuple(i for i, t in enumerate(AUGMENT_SCHEDULE) if t < 5)


def _u8(img: jnp.ndarray) -> jnp.ndarray:
    # clip+truncate, bit-identical to the host writer's
    # np.clip(...).astype(np.uint8) (`writer.py:_hwc8`)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


@jax.jit
def _jit_pack(pairs_12: jnp.ndarray, geo1: jnp.ndarray, geo2: jnp.ndarray,
              pho1_img: jnp.ndarray, pho2_img: jnp.ndarray):
    """Cast to storage dtypes ON DEVICE (uint8 images, f16 floats).

    Host transfer is the synthesis bottleneck on remote-attached chips
    (measured ~32 MB/s on the axon tunnel); packing cuts the per-image
    payload from ~800 MB f32 to ~280 MB and matches what the npz shard
    stores anyway (writer schema: u8 images, f16 depth/flow).
    """
    pairs_img = jnp.stack([pairs_12[:, 0:3], pairs_12[:, 4:7]], 1)  # [5,2,3]
    pairs_flt = jnp.concatenate(
        [pairs_12[:, 3:4], pairs_12[:, 7:8], pairs_12[:, 8:12]], axis=1)
    # geo sets: [5, G, 8, H, W] -> img [5, G, 2, 3], flt [5, G, 2, 5]
    geo_img = jnp.stack([geo1[:, :, 0:3], geo2[:, :, 4:7]], 2)
    geo_flt = jnp.stack([
        jnp.concatenate([geo1[:, :, 3:4], geo1[:, :, 4:8]], 2),   # d0,f,b
        jnp.concatenate([geo2[:, :, 7:8], geo2[:, :, 0:4]], 2),   # d1,f,b
    ], 2)
    pho_img = jnp.stack([pho1_img, pho2_img], 2)                   # [5,P,2,3]
    return {
        "pairs_img_u8": _u8(pairs_img),
        "pairs_flt_f16": pairs_flt.astype(jnp.float16),
        "geo_img_u8": _u8(geo_img),
        "geo_flt_f16": geo_flt.astype(jnp.float16),
        "pho_img_u8": _u8(pho_img),
    }


def synthesize_sample_packed(key: jax.Array, img0: jnp.ndarray,
                             depth0: jnp.ndarray, is_stereo: bool = False
                             ) -> Dict[str, jnp.ndarray]:
    """Like :func:`synthesize_sample` but returns storage-ready tensors.

    Photometric augmentations (types 0-2) change only the images
    (`preprocess.py:150-182`); their depth/flow channels are identical to
    the parent pair's, so only the augmented images are materialized —
    the writer re-uses the pair tensors for those npz keys. Geometric sets
    carry all 8 channels.

    Returns device arrays:
      'group_f16'     [44, H, W]
      'pairs_img_u8'  [5, 2, 3, H, W]   (img_a, img_b)
      'pairs_flt_f16' [5, 6, H, W]      (depth_a, depth_b, flow, back_flow)
      'geo_img_u8'    [5, 9, 2, 3, H, W]  (set1 aug_img0, set2 aug_img1)
      'geo_flt_f16'   [5, 9, 2, 5, H, W]  (aug_depth, aug_flow, aug_back)
      'pho_img_u8'    [5, 3, 2, 3, H, W]
      'aug_types'     [12] int32
    """
    k_group, k_aug = jax.random.split(key)
    pairs = _jit_group(k_group, img0, depth0, is_stereo)
    stacked = Pair(*(jnp.stack([getattr(p, f) for p in pairs])
                     for f in Pair._fields))
    n_pairs = len(pairs)

    set1 = [[None] * len(AUGMENT_SCHEDULE) for _ in range(n_pairs)]
    set2 = [[None] * len(AUGMENT_SCHEDULE) for _ in range(n_pairs)]
    for t in sorted(set(AUGMENT_SCHEDULE)):
        positions = [i for i, tt in enumerate(AUGMENT_SCHEDULE) if tt == t]
        keys = jnp.stack([
            jax.random.fold_in(jax.random.fold_in(k_aug, gi), ai)
            for gi in range(n_pairs) for ai in positions])
        rep = Pair(*(jnp.repeat(x, len(positions), axis=0) for x in stacked))
        out = _jit_augment(t)(keys, rep)
        for j, (gi, ai) in enumerate(
                (g, a) for g in range(n_pairs) for a in positions):
            set1[gi][ai] = out.set1[j]
            set2[gi][ai] = out.set2[j]

    geo1 = jnp.stack([jnp.stack([set1[g][a] for a in GEO_POSITIONS])
                      for g in range(n_pairs)])
    geo2 = jnp.stack([jnp.stack([set2[g][a] for a in GEO_POSITIONS])
                      for g in range(n_pairs)])
    # photometric: set1 ch 0:3 = aug img0, set2 ch 4:7 = aug img1
    pho1 = jnp.stack([jnp.stack([set1[g][a][0:3] for a in PHO_POSITIONS])
                      for g in range(n_pairs)])
    pho2 = jnp.stack([jnp.stack([set2[g][a][4:7] for a in PHO_POSITIONS])
                      for g in range(n_pairs)])

    pairs_12 = jnp.stack([p.stacked() for p in pairs])
    packed = _jit_pack(pairs_12, geo1, geo2, pho1, pho2)
    packed["group_f16"] = _jit_group_f16(pairs)
    packed["aug_types"] = jnp.asarray(AUGMENT_SCHEDULE, jnp.int32)
    return packed


@jax.jit
def _jit_group_f16(pairs):
    return group_tensor(pairs).astype(jnp.float16)
