"""Datasets: benchmark flow datasets + synthesized-shard datasets + stages.

Host-side (numpy) data plane mirroring the reference's dataset layer
(D5/D6, `adjusted_RAFT/core/datasets.py`, `adjusted_gmflow/data/datasets.py`)
with one coherent sample schema (dict of numpy arrays) instead of the
reference's drifting tuples (SURVEY.md §2.3 D2):

    image1 [H, W, 3] f32 (0..255)   image2 [H, W, 3] f32
    flow   [H, W, 2] f32            valid  [H, W] f32
    label  [4] f32 one-hot          (optional) back_flow, depth1, depth2

Benchmark datasets: MpiSintel, FlyingChairs, FlyingThings3D, KITTI,
KITTI12, FineTuneKITTI15 (160/40 split), HD1K (with the reference's
`seq_ix += -1` bug fixed, `adjusted_RAFT/core/datasets.py:247`).

Synthesized data: :class:`AugmentedShards` reads the npz shards written by
`synth.writer` (explicit keys; no schema drift) with the reference's random
group/augment/side selection (`dataloader.py:235-268`) and optional dense
re-augmentation incl. back_flow/depths (`core/datasets.py:249-304`).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import frame_io
from .augmentor import FlowAugmentor, SparseFlowAugmentor
from ..synth.writer import dequantize_flow

NUM_CLASSES = 4  # {none, flip, rotate, shear}; `dataloader.py:11`


def one_hot(label: int, n: int = NUM_CLASSES) -> np.ndarray:
    v = np.zeros((n,), np.float32)
    v[label] = 1.0
    return v


class FlowDataset:
    """Base reader (`adjusted_RAFT/core/datasets.py:18-100`)."""

    def __init__(self, aug_params: Optional[dict] = None,
                 sparse: bool = False, seed: Optional[int] = None):
        self.sparse = sparse
        self.augmentor = None
        if aug_params is not None:
            cls = SparseFlowAugmentor if sparse else FlowAugmentor
            self.augmentor = cls(**aug_params)
        self.is_test = False
        self.init_seed_done = seed is not None
        self.flow_list: List[str] = []
        self.image_list: List[Tuple[str, str]] = []
        self.extra_info: List = []

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        index = index % len(self.image_list)
        img1 = frame_io.read_gen(self.image_list[index][0])
        img2 = frame_io.read_gen(self.image_list[index][1])
        img1 = np.asarray(img1, np.uint8)
        img2 = np.asarray(img2, np.uint8)
        if img1.ndim == 2:  # grayscale
            img1 = np.tile(img1[..., None], (1, 1, 3))
            img2 = np.tile(img2[..., None], (1, 1, 3))
        else:
            img1 = img1[..., :3]
            img2 = img2[..., :3]

        if self.is_test:
            return {
                "image1": img1.astype(np.float32),
                "image2": img2.astype(np.float32),
                "extra_info": self.extra_info[index],
            }

        valid = None
        if self.sparse:
            flow, valid = frame_io.read_flow_kitti(self.flow_list[index])
        else:
            flow = frame_io.read_gen(self.flow_list[index])
        flow = np.asarray(flow, np.float32)

        if self.augmentor is not None:
            if self.sparse:
                img1, img2, flow, valid = self.augmentor(
                    img1, img2, flow, valid)
            else:
                img1, img2, flow, _, _, _ = self.augmentor(img1, img2, flow)

        if valid is None:
            # dense GT: valid where |flow| < 1000 (`datasets.py:95-98`)
            valid = ((np.abs(flow[..., 0]) < 1000) &
                     (np.abs(flow[..., 1]) < 1000))
        return {
            "image1": np.ascontiguousarray(img1, np.float32),
            "image2": np.ascontiguousarray(img2, np.float32),
            "flow": np.ascontiguousarray(flow, np.float32),
            "valid": np.ascontiguousarray(valid, np.float32),
            "label": one_hot(0),
        }


class MpiSintel(FlowDataset):
    """`datasets.py:103-131`; also loads occlusion maps when present
    (GMFlow matched/unmatched eval, `adjusted_gmflow/data/datasets.py:61-127`)."""

    def __init__(self, aug_params=None, split="training", root="datasets/Sintel",
                 dstype="clean", load_occlusion: bool = False):
        super().__init__(aug_params)
        flow_root = osp.join(root, split, "flow")
        image_root = osp.join(root, split, dstype)
        occ_root = osp.join(root, split, "occlusions")
        self.occ_list: List[str] = []
        self.load_occlusion = load_occlusion
        if split == "test":
            self.is_test = True
        for scene in sorted(os.listdir(image_root)):
            image_list = sorted(glob.glob(osp.join(image_root, scene, "*.png")))
            for i in range(len(image_list) - 1):
                self.image_list.append((image_list[i], image_list[i + 1]))
                self.extra_info.append((scene, i))
            if split != "test":
                self.flow_list.extend(sorted(
                    glob.glob(osp.join(flow_root, scene, "*.flo"))))
                if load_occlusion:
                    self.occ_list.extend(sorted(
                        glob.glob(osp.join(occ_root, scene, "*.png"))))
        if load_occlusion and split != "test":
            # A partially populated occlusions/ tree would silently pair
            # wrong occlusion maps with frames; fail loudly instead
            # (the reference indexes occ_list directly and would crash,
            # `adjusted_gmflow/data/datasets.py:88-94`).
            if not self.occ_list:
                warnings.warn(
                    f"load_occlusion requested but no occlusion maps under "
                    f"{occ_root}; matched/unmatched metrics will be skipped")
                self.load_occlusion = False
            elif len(self.occ_list) != len(self.flow_list):
                raise ValueError(
                    f"Sintel occlusions/ is partially populated: "
                    f"{len(self.occ_list)} occlusion maps vs "
                    f"{len(self.flow_list)} flows under {occ_root}")

    def __getitem__(self, index):
        sample = super().__getitem__(index)
        if self.load_occlusion and not self.is_test and self.occ_list:
            occ = frame_io.read_image(self.occ_list[index])
            sample["occlusion"] = (occ[..., 0] > 127).astype(np.float32)
        return sample


class FlyingChairs(FlowDataset):
    """`datasets.py:134-155`; split via chairs_split.txt (1=train, 2=val)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/FlyingChairs_release/data",
                 split_file="chairs_split.txt"):
        super().__init__(aug_params)
        images = sorted(glob.glob(osp.join(root, "*.ppm")))
        flows = sorted(glob.glob(osp.join(root, "*.flo")))
        assert len(images) // 2 == len(flows), (len(images), len(flows))
        split_path = split_file if osp.exists(split_file) else osp.join(
            osp.dirname(root), split_file)
        if osp.exists(split_path):
            split_list = np.loadtxt(split_path, dtype=np.int32)
        else:  # all-train fallback when the split file isn't shipped
            split_list = np.ones((len(flows),), np.int32)
        for i in range(len(flows)):
            xid = split_list[i]
            if (split == "training" and xid == 1) or \
               (split == "validation" and xid == 2):
                self.flow_list.append(flows[i])
                self.image_list.append((images[2 * i], images[2 * i + 1]))


class FlyingThings3D(FlowDataset):
    """`datasets.py:158-198`; both directions, TEST split optional."""

    def __init__(self, aug_params=None, root="datasets/FlyingThings3D",
                 dstype="frames_cleanpass", test_set: bool = False):
        super().__init__(aug_params)
        split_dir = "TEST" if test_set else "TRAIN"
        for cam in ("left",):
            for direction in ("into_future", "into_past"):
                image_dirs = sorted(glob.glob(
                    osp.join(root, dstype, f"{split_dir}/*/*")))
                image_dirs = sorted([osp.join(f, cam) for f in image_dirs])
                flow_dirs = sorted(glob.glob(
                    osp.join(root, f"optical_flow/{split_dir}/*/*")))
                flow_dirs = sorted(
                    [osp.join(f, direction, cam) for f in flow_dirs])
                for idir, fdir in zip(image_dirs, flow_dirs):
                    images = sorted(glob.glob(osp.join(idir, "*.png")))
                    flows = sorted(glob.glob(osp.join(fdir, "*.pfm")))
                    for i in range(len(flows) - 1):
                        if direction == "into_future":
                            self.image_list.append((images[i], images[i + 1]))
                            self.flow_list.append(flows[i])
                        else:
                            self.image_list.append((images[i + 1], images[i]))
                            self.flow_list.append(flows[i + 1])


class KITTI(FlowDataset):
    """KITTI-2015 (`datasets.py:201-219`)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/KITTI"):
        super().__init__(aug_params, sparse=True)
        if split == "testing":
            self.is_test = True
        root = osp.join(root, split)
        images1 = sorted(glob.glob(osp.join(root, "image_2/*_10.png")))
        images2 = sorted(glob.glob(osp.join(root, "image_2/*_11.png")))
        for img1, img2 in zip(images1, images2):
            frame_id = img1.split("/")[-1]
            self.extra_info.append([frame_id])
            self.image_list.append((img1, img2))
        if split == "training":
            self.flow_list = sorted(
                glob.glob(osp.join(root, "flow_occ/*_10.png")))


class KITTI12(FlowDataset):
    """KITTI-2012 (`datasets.py:221-238`; images live in colored_0/)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/KITTI12"):
        super().__init__(aug_params, sparse=True)
        if split == "testing":
            self.is_test = True
        root = osp.join(root, split)
        images1 = sorted(glob.glob(osp.join(root, "colored_0/*_10.png")))
        images2 = sorted(glob.glob(osp.join(root, "colored_0/*_11.png")))
        for img1, img2 in zip(images1, images2):
            self.extra_info.append([img1.split("/")[-1]])
            self.image_list.append((img1, img2))
        if split == "training":
            self.flow_list = sorted(
                glob.glob(osp.join(root, "flow_occ/*_10.png")))


class FineTuneKITTI15(FlowDataset):
    """160-train/40-val split of KITTI-2015 training (`datasets.py:201-228`)."""

    def __init__(self, aug_params=None, split="training",
                 root="datasets/KITTI"):
        super().__init__(aug_params, sparse=True)
        base = osp.join(root, "training")
        images1 = sorted(glob.glob(osp.join(base, "image_2/*_10.png")))
        images2 = sorted(glob.glob(osp.join(base, "image_2/*_11.png")))
        flows = sorted(glob.glob(osp.join(base, "flow_occ/*_10.png")))
        sl = slice(0, 160) if split == "training" else slice(160, 200)
        for img1, img2, flow in zip(images1[sl], images2[sl], flows[sl]):
            self.extra_info.append([img1.split("/")[-1]])
            self.image_list.append((img1, img2))
            self.flow_list.append(flow)


class HD1K(FlowDataset):
    """`datasets.py:240-257` (the reference's `seq_ix += -1` infinite-loop
    bug at `:247` is fixed: we iterate sequences forward)."""

    def __init__(self, aug_params=None, root="datasets/HD1k"):
        super().__init__(aug_params, sparse=True)
        seq_ix = 0
        while True:
            flows = sorted(glob.glob(
                osp.join(root, "hd1k_flow_gt",
                         f"flow_occ/{seq_ix:06d}_*.png")))
            images = sorted(glob.glob(
                osp.join(root, "hd1k_input", f"image_2/{seq_ix:06d}_*.png")))
            if len(flows) == 0:
                break
            for i in range(len(flows) - 1):
                self.flow_list.append(flows[i])
                self.image_list.append((images[i], images[i + 1]))
            seq_ix += 1


# ---------------------------------------------------------------------------
# synthesized shards
# ---------------------------------------------------------------------------

class AugmentedShards:
    """Reader for `synth.writer` npz shards (replaces D2/D4 + the
    RAFT/GMFlow re-augmenting wrappers).

    Each shard file `{stem}_g{group}_a{aug}.npz` holds both sides of one
    augmented pair with explicit keys. Index selection mirrors
    `dataloader.py:235-268`: random group in {0..4}, random augment in
    {0..11}, random side; `__len__` is ``epochs x len(list)``.

    ``re_augment`` applies the dense FlowAugmentor incl. back_flow/depths
    (`core/datasets.py:269-289`); valid ∧= depth1 != 100 (`:291-297`).
    """

    def __init__(self, root: str, crop_size: Optional[Tuple[int, int]] = None,
                 re_augment: bool = False, aug_params: Optional[dict] = None,
                 epochs: int = 2, seed: Optional[int] = None,
                 h_flip_prob: float = 0.5, v_flip_prob: float = 0.1):
        self.root = root
        self.files = sorted(glob.glob(osp.join(root, "*_g*_a*.npz")))
        if not self.files:
            raise FileNotFoundError(f"no synthesized shards under {root}")
        self.crop_size = crop_size
        self.epochs = epochs
        self.rng = np.random.default_rng(seed)
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob
        self.augmentor = None
        if re_augment:
            params = dict(aug_params or {})
            params.setdefault("crop_size", crop_size)
            self.augmentor = FlowAugmentor(**params)

    def __len__(self) -> int:
        return self.epochs * len(self.files)

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        """Corrupt files fall through to the next index
        (`dataloader.py:81-91`)."""
        from . import native_io

        for off in range(len(self.files)):
            path = self.files[(index + off) % len(self.files)]
            try:
                # C++ decode pool (native/shardio.cc) when built; np.load
                # fallback otherwise — identical dict-of-array contract.
                return native_io.load_npz(path)
            except Exception:
                continue
        raise RuntimeError(f"all shards unreadable under {self.root}")

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        data = self._load(index % len(self.files))
        side = int(self.rng.integers(0, 2))
        sfx = "1" if side == 0 else "2"
        img1 = data[f"img0_{sfx}"].astype(np.float32)
        img2 = data[f"img1_{sfx}"].astype(np.float32)
        # flows may be f16 (default) or int16 fixed-point (1/64 px,
        # --flow_int16 shards); decode by dtype
        flow = dequantize_flow(data[f"flow_{sfx}"])
        back_flow = dequantize_flow(data[f"back_flow_{sfx}"])
        depth1 = data[f"depth0_{sfx}"].astype(np.float32)
        depth2 = data[f"depth1_{sfx}"].astype(np.float32)
        label = int(data["label"])

        if self.augmentor is not None:
            img1, img2, flow, back_flow, depth1, depth2 = self.augmentor(
                img1, img2, flow, back_flow, depth1, depth2)
        else:
            # plain flip path (`dataloader.py:129-142`)
            if self.rng.random() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
                back_flow = back_flow[:, ::-1] * [-1.0, 1.0]
                depth1, depth2 = depth1[:, ::-1], depth2[:, ::-1]
            if self.rng.random() < self.v_flip_prob:
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * [1.0, -1.0]
                back_flow = back_flow[::-1] * [1.0, -1.0]
                depth1, depth2 = depth1[::-1], depth2[::-1]
            if self.crop_size is not None:
                ch, cw = self.crop_size
                h, w = img1.shape[:2]
                y0 = int(self.rng.integers(0, max(h - ch, 0) + 1))
                x0 = int(self.rng.integers(0, max(w - cw, 0) + 1))
                sel = (slice(y0, y0 + ch), slice(x0, x0 + cw))
                img1, img2 = img1[sel], img2[sel]
                flow, back_flow = flow[sel], back_flow[sel]
                depth1, depth2 = depth1[sel], depth2[sel]

        d1 = np.squeeze(depth1, -1) if depth1.ndim == 3 else depth1
        valid = ((np.abs(flow[..., 0]) < 1000) &
                 (np.abs(flow[..., 1]) < 1000) &
                 (d1 != 100.0))
        return {
            "image1": np.ascontiguousarray(img1, np.float32),
            "image2": np.ascontiguousarray(img2, np.float32),
            "flow": np.ascontiguousarray(flow, np.float32),
            "back_flow": np.ascontiguousarray(back_flow, np.float32),
            "depth1": np.ascontiguousarray(
                depth1.reshape(depth1.shape[:2]), np.float32),
            "depth2": np.ascontiguousarray(
                depth2.reshape(depth2.shape[:2]), np.float32),
            "valid": np.ascontiguousarray(valid, np.float32),
            # label 0 for photometric types, 1/2/3 for flip/rotate/shear
            # (`dataloader.py:154-157`: max(0, type-4))
            "label": one_hot(max(0, label - 4)),
        }


class DepthToFlowShards:
    """Reader training directly on the *un-augmented* group pairs (D3,
    `dataloader.py:160-232` — dead code in the reference: nothing consumes
    it, and its channel indices target a pre-drift group layout; this is
    the working equivalent against our `{stem}_group.npz` shards).

    Each group tensor is the 44-channel layout of `preprocess.py:437-447`
    (`synth.pipeline.group_tensor`). ``random_group`` selects one of the
    three supervised pairs the reference reader exposes, mapped to the
    *semantically correct* channels of that layout (the reference pairs
    flow02 with the pre-inpaint img2; we pair it with img2', the image the
    flow was actually composed for, `preprocess.py:430`):

        0: (img0 0:3,  d0 3:4,  img1  4:7,   d1  7:8,  flow01 24:26, back 26:28)
        1: (img1 4:7,  d1 7:8,  img2  8:11,  d2 11:12, flow12 28:30, back 30:32)
        2: (img0 0:3,  d0 3:4,  img2' 16:19, d2' 19:20, flow02 32:34, back 34:36)

    Label is always class 0 / "no geometric augmentation"
    (`dataloader.py:229-231`). Flip/crop mirror the augmented reader.
    """

    _PAIRS = (
        ((0, 3), (3, 4), (4, 7), (7, 8), (24, 26), (26, 28)),
        ((4, 7), (7, 8), (8, 11), (11, 12), (28, 30), (30, 32)),
        ((0, 3), (3, 4), (16, 19), (19, 20), (32, 34), (34, 36)),
    )

    def __init__(self, root: str, crop_size: Optional[Tuple[int, int]] = None,
                 epochs: int = 2, seed: Optional[int] = None,
                 h_flip_prob: float = 0.5, v_flip_prob: float = 0.1):
        self.root = root
        self.files = sorted(glob.glob(osp.join(root, "*_group.npz")))
        if not self.files:
            raise FileNotFoundError(f"no group shards under {root}")
        self.crop_size = crop_size
        self.epochs = epochs
        self.rng = np.random.default_rng(seed)
        self.h_flip_prob = h_flip_prob
        self.v_flip_prob = v_flip_prob

    def __len__(self) -> int:
        return self.epochs * len(self.files)

    def _load(self, index: int) -> np.ndarray:
        """Corrupt files fall through to the next (`dataloader.py:180-184`)."""
        from . import native_io

        for off in range(len(self.files)):
            path = self.files[(index + off) % len(self.files)]
            try:
                return native_io.load_npz(path)["group"]
            except Exception:
                continue
        raise RuntimeError(f"all group shards unreadable under {self.root}")

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        group = self._load(index % len(self.files))  # [44, H, W] f16
        (i0, d0, i1, d1, fl, bk) = self._PAIRS[int(self.rng.integers(0, 3))]

        def chw(lo, hi):  # [C, H, W] f16 -> [H, W, C] f32
            return np.moveaxis(group[lo:hi], 0, -1).astype(np.float32)

        img1, img2 = chw(*i0), chw(*i1)
        depth1, depth2 = chw(*d0)[..., 0], chw(*d1)[..., 0]
        flow, back_flow = chw(*fl), chw(*bk)

        if self.rng.random() < self.h_flip_prob:
            img1, img2 = img1[:, ::-1], img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            back_flow = back_flow[:, ::-1] * [-1.0, 1.0]
            depth1, depth2 = depth1[:, ::-1], depth2[:, ::-1]
        if self.rng.random() < self.v_flip_prob:
            img1, img2 = img1[::-1], img2[::-1]
            flow = flow[::-1] * [1.0, -1.0]
            back_flow = back_flow[::-1] * [1.0, -1.0]
            depth1, depth2 = depth1[::-1], depth2[::-1]
        if self.crop_size is not None:
            ch, cw = self.crop_size
            h, w = img1.shape[:2]
            y0 = int(self.rng.integers(0, max(h - ch, 0) + 1))
            x0 = int(self.rng.integers(0, max(w - cw, 0) + 1))
            sel = (slice(y0, y0 + ch), slice(x0, x0 + cw))
            img1, img2 = img1[sel], img2[sel]
            flow, back_flow = flow[sel], back_flow[sel]
            depth1, depth2 = depth1[sel], depth2[sel]

        valid = ((np.abs(flow[..., 0]) < 1000) &
                 (np.abs(flow[..., 1]) < 1000) &
                 (depth1 != 100.0))
        return {
            "image1": np.ascontiguousarray(img1, np.float32),
            "image2": np.ascontiguousarray(img2, np.float32),
            "flow": np.ascontiguousarray(flow, np.float32),
            "back_flow": np.ascontiguousarray(back_flow, np.float32),
            "depth1": np.ascontiguousarray(depth1, np.float32),
            "depth2": np.ascontiguousarray(depth2, np.float32),
            "valid": np.ascontiguousarray(valid, np.float32),
            "label": one_hot(0),  # always un-augmented (`dataloader.py:229`)
        }


class ConcatDataset:
    """Concatenation + integer-multiplication of datasets
    (replaces torch ConcatDataset use in `datasets.py:306-358`)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.sizes = [len(d) for d in self.datasets]
        self.total = sum(self.sizes)

    def __len__(self):
        return self.total

    def __getitem__(self, index):
        index = index % self.total
        for d, n in zip(self.datasets, self.sizes):
            if index < n:
                return d[index]
            index -= n
        raise IndexError


def fetch_train_dataset(stage: str, crop_size: Tuple[int, int],
                        shards_root: Optional[Dict[str, str]] = None,
                        data_root: str = "datasets",
                        eraser_aug_prob: float = 0.5,
                        seed: Optional[int] = None):
    """Stage recipes (`adjusted_RAFT/core/datasets.py:306-352`,
    `adjusted_gmflow/data/datasets.py:373-441`).

    shards_root maps {'redweb': dir, 'diml': dir} for the synthesized
    stages; `mixed` concatenates both (`datasets.py:347-352`).
    """
    aug = dict(crop_size=crop_size, eraser_aug_prob=eraser_aug_prob)

    if stage == "chairs":
        return FlyingChairs(
            dict(aug, min_scale=-0.1, max_scale=1.0, do_flip=True),
            split="training", root=osp.join(
                data_root, "FlyingChairs_release/data"))
    if stage == "things":
        clean = FlyingThings3D(
            dict(aug, min_scale=-0.4, max_scale=0.8, do_flip=True),
            root=osp.join(data_root, "FlyingThings3D"),
            dstype="frames_cleanpass")
        final = FlyingThings3D(
            dict(aug, min_scale=-0.4, max_scale=0.8, do_flip=True),
            root=osp.join(data_root, "FlyingThings3D"),
            dstype="frames_finalpass")
        return ConcatDataset([clean, final])
    if stage == "sintel":
        base = dict(aug, min_scale=-0.2, max_scale=0.6, do_flip=True)
        things = FlyingThings3D(base, root=osp.join(
            data_root, "FlyingThings3D"), dstype="frames_cleanpass")
        sintel_clean = MpiSintel(base, split="training", dstype="clean",
                                 root=osp.join(data_root, "Sintel"))
        sintel_final = MpiSintel(base, split="training", dstype="final",
                                 root=osp.join(data_root, "Sintel"))
        kitti = KITTI(dict(aug, min_scale=-0.3, max_scale=0.5, do_flip=True),
                      root=osp.join(data_root, "KITTI"))
        hd1k = HD1K(dict(aug, min_scale=-0.5, max_scale=0.2, do_flip=True),
                    root=osp.join(data_root, "HD1k"))
        # 100*sintel_clean + 100*sintel_final + 200*kitti + 5*hd1k + things
        return ConcatDataset(
            [sintel_clean] * 100 + [sintel_final] * 100 + [kitti] * 200 +
            [hd1k] * 5 + [things])
    if stage in ("kitti", "finetunekitti15"):
        params = dict(aug, min_scale=-0.2, max_scale=0.4, do_flip=False)
        if stage == "kitti":
            return KITTI(params, split="training",
                         root=osp.join(data_root, "KITTI"))
        return FineTuneKITTI15(params, split="training",
                               root=osp.join(data_root, "KITTI"))
    if stage in ("augmentedredweb", "augmenteddiml", "mixed"):
        assert shards_root, "synthesized stages need shards_root dirs"
        parts = []
        keys = {"augmentedredweb": ["redweb"], "augmenteddiml": ["diml"],
                "mixed": ["redweb", "diml"]}[stage]
        for k in keys:
            parts.append(AugmentedShards(
                shards_root[k], crop_size=crop_size, re_augment=True,
                aug_params=dict(aug, min_scale=-0.2, max_scale=0.5,
                                do_flip=True),
                seed=seed))
        return parts[0] if len(parts) == 1 else ConcatDataset(parts)
    if stage == "depthtoflow":
        # un-augmented group pairs, label 0 (D3, `dataloader.py:160-232`);
        # uses every shards_root dir given (redweb and/or diml)
        assert shards_root, "depthtoflow stage needs shards_root dirs"
        parts = [DepthToFlowShards(root, crop_size=crop_size, seed=seed)
                 for root in shards_root.values()]
        return parts[0] if len(parts) == 1 else ConcatDataset(parts)
    raise ValueError(f"unknown stage: {stage}")
