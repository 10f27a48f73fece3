"""Full-image datamanager: one-time undistortion cache + per-step batches.

Role of the reference FullImageDatamanager (/root/reference/nerfstudio/
data/datamanagers/full_images_datamanager.py): cache + cv2-undistort every
image up-front (:123-285), sample cameras randomly without replacement
(:361-378), and — folded in here from the reference model's dynamic
samplers (gaussian_splatting.py:120-148) — draw the SAM-mask pixel pairs
and CLIP distillation pixels as FIXED-SIZE index tensors so the jitted
loss never sees a dynamic shape. The sampling distribution is preserved:
uniform over pixels within each mask id, uniform over present mask ids.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from gaussiangrasper_tpu.core.cameras import Camera
from gaussiangrasper_tpu.data.dataparsers.base import DataparserOutputs, ParsedCamera
from gaussiangrasper_tpu.data.dataset import InputDataset


@dataclasses.dataclass
class SamplerConfig:
    max_groups: int = 32       # SAM mask ids per step (the reference uses all)
    pairs_per_group: int = 800  # contrastive pairs per id (ref :911: 800)
    num_points: int = 1000      # CLIP distillation pixels (ref :912: 1000)
    clip_dim: int = 512


def undistort_image(img: np.ndarray, cam: ParsedCamera) -> Tuple[np.ndarray, ParsedCamera]:
    """One-time cv2 undistortion, updating intrinsics (ref
    full_images_datamanager.py:123-285, perspective & fisheye branches)."""
    import cv2

    d = cam.distortion
    if not np.any(d):
        return img, cam
    k = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    if cam.camera_type == "fisheye":
        dist = np.array([d[0], d[1], d[4], d[5]])
        newk = cv2.fisheye.estimateNewCameraMatrixForUndistortRectify(
            k, dist, (img.shape[1], img.shape[0]), np.eye(3), balance=0.0
        )
        map1, map2 = cv2.fisheye.initUndistortRectifyMap(
            k, dist, np.eye(3), newk, (img.shape[1], img.shape[0]), cv2.CV_32FC1
        )
        out = cv2.remap(img, map1, map2, interpolation=cv2.INTER_LINEAR)
    else:
        dist = np.array([d[0], d[1], d[2], d[3], d[4]])
        newk, _ = cv2.getOptimalNewCameraMatrix(
            k, dist, (img.shape[1], img.shape[0]), 0
        )
        out = cv2.undistort(img, k, dist, None, newk)
    cam2 = dataclasses.replace(
        cam,
        fx=float(newk[0, 0]), fy=float(newk[1, 1]),
        cx=float(newk[0, 2]), cy=float(newk[1, 2]),
        distortion=np.zeros(6),
    )
    return out, cam2


class FullImageDatamanager:
    """Caches all per-view data host-side; emits (Camera, batch) pairs whose
    batch leaves are fixed-shape jnp arrays ready for the jitted step."""

    def __init__(
        self,
        outputs: DataparserOutputs,
        sampler: SamplerConfig = SamplerConfig(),
        seed: int = 0,
        cache_all: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """process_index/count: multi-host data sharding — each host trains
        on its round-robin camera subset (the TPU-native successor of the
        reference's rank-offset seeds + DistributedSampler-style split,
        scripts/train.py:98)."""
        self.outputs = outputs
        self.dataset = InputDataset(outputs)
        self.sampler = sampler
        self.rng = np.random.default_rng(seed + process_index)
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._order: List[int] = []
        self.cameras: List[ParsedCamera] = list(outputs.cameras)
        n = len(self.dataset)
        self._local_indices = [
            i for i in range(n) if i % process_count == process_index
        ] or list(range(n))
        if cache_all:
            for i in self._local_indices:
                self._load(i)

    def __len__(self) -> int:
        return len(self.dataset)

    def _load(self, idx: int) -> Dict[str, np.ndarray]:
        if idx not in self._cache:
            data = self.dataset.get_data(idx)
            cam = self.cameras[idx]
            if np.any(cam.distortion):
                img, cam2 = undistort_image(
                    (data["image"] * 255).astype(np.uint8), cam
                )
                data["image"] = img.astype(np.float32) / 255.0
                self.cameras[idx] = cam2
            self._cache[idx] = data
        return self._cache[idx]

    def camera(self, idx: int) -> Camera:
        c = self.cameras[idx]
        return Camera.create(
            c.fx, c.fy, c.cx, c.cy, c.camera_to_world, c.width, c.height
        )

    # ---- reference sampling semantics, fixed-size (ref :120-148) ----

    def _sample_mask_pairs(self, sam: np.ndarray):
        s = self.sampler
        g, p = s.max_groups, s.pairs_per_group
        ids = np.unique(sam)
        ids = ids[ids > -1]
        if len(ids) > g:
            ids = self.rng.choice(ids, g, replace=False)
        pair_a = np.zeros((g, p, 2), np.int32)
        pair_b = np.zeros((g, p, 2), np.int32)
        pair_valid = np.zeros((g, p), bool)
        group_valid = np.zeros((g,), bool)
        for gi, mid in enumerate(ids):
            ys, xs = np.nonzero(sam == mid)
            if len(ys) < 2:
                continue
            ia = self.rng.integers(0, len(ys), p)
            ib = self.rng.integers(0, len(ys), p)
            pair_a[gi, :, 0], pair_a[gi, :, 1] = ys[ia], xs[ia]
            pair_b[gi, :, 0], pair_b[gi, :, 1] = ys[ib], xs[ib]
            pair_valid[gi] = True
            group_valid[gi] = True
        return pair_a, pair_b, pair_valid, group_valid

    def _sample_points(self, sam: np.ndarray, clip: Optional[np.ndarray], h, w):
        """Distillation pixels: uniform within union of masks (ref
        sampling_in_mask :120-132 — num_samples split evenly per id)."""
        s = self.sampler
        n = s.num_points
        points = np.zeros((n, 2), np.int32)
        valid = np.zeros((n,), bool)
        gt = np.zeros((n, s.clip_dim), np.float32)
        ids = np.unique(sam)
        ids = ids[ids > -1]
        if len(ids) == 0 or clip is None:
            return points, valid, gt
        per = max(n // len(ids), 1)
        k = 0
        for mid in ids:
            if k >= n:
                break
            ys, xs = np.nonzero(sam == mid)
            if len(ys) == 0:
                continue
            take = min(per, n - k)
            sel = self.rng.integers(0, len(ys), take)
            points[k : k + take, 0] = ys[sel]
            points[k : k + take, 1] = xs[sel]
            valid[k : k + take] = True
            k += take
        fh, fw = clip.shape[:2]
        fy = (points[:, 0] * fh) // max(h, 1)
        fx = (points[:, 1] * fw) // max(w, 1)
        gt[valid] = clip[fy[valid], fx[valid]]
        return points, valid, gt

    def get_batch(self, idx: int) -> Tuple[Camera, Dict[str, jnp.ndarray]]:
        data = self._load(idx)
        h, w = data["image"].shape[:2]
        # ids outside the validity mask never get sampled (the reference
        # sets gt_mask[~valid_mask] = -1, ref get_loss_dict :871)
        sam = np.where(data["valid_mask"], data["sam_mask"], -1).astype(np.int32)
        s = self.sampler
        clip = data.get("clip_features")

        # native single-pass sampler (C++ via ctypes); numpy fallback below
        from gaussiangrasper_tpu import native

        fast = native.sample_mask_batch(
            sam, s.max_groups, s.pairs_per_group, s.num_points,
            seed=int(self.rng.integers(1, 2**63)),
        )
        if fast is not None:
            pair_a, pair_b, pair_valid, group_valid, points, point_valid = fast
            gt_clip = np.zeros((s.num_points, s.clip_dim), np.float32)
            if clip is not None and point_valid.any():
                fh, fw = clip.shape[:2]
                fy = (points[:, 0] * fh) // max(h, 1)
                fx = (points[:, 1] * fw) // max(w, 1)
                gt_clip[point_valid] = clip[fy[point_valid], fx[point_valid]]
            else:
                point_valid = np.zeros_like(point_valid)
        else:
            pair_a, pair_b, pair_valid, group_valid = self._sample_mask_pairs(sam)
            points, point_valid, gt_clip = self._sample_points(sam, clip, h, w)
        batch = {
            "image": jnp.asarray(data["image"]),
            "depth": jnp.asarray(data["depth"]),
            "normal": jnp.asarray(data["normal"]),
            "valid_mask": jnp.asarray(data["valid_mask"]),
            # valid-gated SAM instance ids; the semantic-nerfw analog
            # consumes these as per-pixel labels
            "sam_mask": jnp.asarray(sam),
            "pair_a": jnp.asarray(pair_a),
            "pair_b": jnp.asarray(pair_b),
            "pair_valid": jnp.asarray(pair_valid),
            "group_valid": jnp.asarray(group_valid),
            "points": jnp.asarray(points),
            "point_valid": jnp.asarray(point_valid),
            "gt_clip": jnp.asarray(gt_clip),
        }
        return self.camera(idx), batch

    def next_train(self) -> Tuple[int, Camera, Dict[str, jnp.ndarray]]:
        """Random camera without replacement per epoch (ref :361-378),
        restricted to this host's shard."""
        if not self._order:
            self._order = [
                self._local_indices[j]
                for j in self.rng.permutation(len(self._local_indices))
            ]
        idx = int(self._order.pop())
        cam, batch = self.get_batch(idx)
        return idx, cam, batch

    @property
    def seed_points(self):
        return self.outputs.seed_points
