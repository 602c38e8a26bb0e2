"""Loading pipeline transforms (host-side, numpy/PIL).

Capability parity with the reference's loading pipeline
(reference: mmdet3d/datasets/pipelines/loading.py —
PointToMultiViewDepth:18-61, LoadMultiViewImageFromFiles_BEVDet:134-628
with per-cam resize/crop/flip/rotate tracked as post_rot/post_tran
homographies and ego-aligned adjacent-frame extrinsics;
LoadPointsFromFile:1050-1206 incl. the MVP ``virtual`` 17-dim merge;
LoadPointsFromMultiSweeps:654-956; LoadAnnotations3D).

Layout deviations (documented, consumed by our detectors):
* images are channels-last fp32 [F*N, H, W, 3], frame-major
  (frame0 cams..., frame1 cams...) — the reference interleaves per cam;
* extrinsics are [F, N, ...] arrays instead of flat lists.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Tuple

import numpy as np

from ..nuscenes_dataset import PIPELINES
from ...core.points import LiDARPoints
from ...utils.geometry import make_transform, invert_transform

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_img(img: np.ndarray, bevdepth_norm: bool = False
                  ) -> np.ndarray:
    """uint8 HWC -> normalized float32 HWC (native C++ fast path when
    built, numpy otherwise — distillbev_tpu/native)."""
    arr = np.asarray(img)
    if bevdepth_norm:
        mean = np.array([123.675, 116.28, 103.53], np.float32)
        std = np.array([58.395, 57.12, 57.375], np.float32)
        scale = 1.0
    else:
        mean, std, scale = IMAGENET_MEAN, IMAGENET_STD, 1.0 / 255.0
    if arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[-1] == 3:
        from ... import native
        if native.available():
            return native.normalize_images(arr[None], mean, std,
                                           scale)[0]
    return (arr.astype(np.float32) * scale - mean) / std


def _rot2(h: float) -> np.ndarray:
    return np.array([[np.cos(h), np.sin(h)],
                     [-np.sin(h), np.cos(h)]], np.float32)


@PIPELINES.register_module()
class LoadMultiViewImageFromFiles_BEVDet:
    """6-cam loading with image-space augmentation homography tracking."""

    def __init__(self, data_config, is_train: bool = False,
                 sequential: bool = False, aligned: bool = False,
                 trans_only: bool = True, root_path: str = "",
                 bevdepth_norm: bool = False, file_client_args=None,
                 fast_jpeg_decode=None):
        self.data_config = dict(data_config)
        self.is_train = is_train
        self.sequential = sequential
        self.aligned = aligned
        self.trans_only = trans_only
        self.root_path = root_path
        self.bevdepth_norm = bevdepth_norm
        # libjpeg scaled decode: decode at the 1/2^k DCT scale nearest
        # above the resize target (PIL draft).  ~4x cheaper decode+resize
        # at nuScenes sizes (1600x900 -> 704x396); the aug homography is
        # exact (resize_dims/crop are absolute), pixel values differ
        # slightly from full-resolution resampling (deviation flag ≈).
        # Default: train pipelines only, so eval-metric parity runs
        # against reference checkpoints use exact full-res decoding.
        if fast_jpeg_decode is None:
            fast_jpeg_decode = is_train
        self.fast_jpeg_decode = fast_jpeg_decode

    # -- augmentation sampling (reference sample_augmentation:215-240) --
    def sample_augmentation(self, h, w, flip=None, scale=None):
        fh, fw = self.data_config["input_size"]
        if self.is_train:
            resize = float(fw) / float(w)
            resize += np.random.uniform(*self.data_config["resize"])
            resize_dims = (int(w * resize), int(h * resize))
            new_w, new_h = resize_dims
            crop_h = int((1 - np.random.uniform(
                *self.data_config["crop_h"])) * new_h) - fh
            crop_w = int(np.random.uniform(0, max(0, new_w - fw)))
            crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
            do_flip = self.data_config["flip"] and np.random.choice(
                [0, 1])
            rotate = np.random.uniform(*self.data_config["rot"])
        else:
            resize = float(fw) / float(w)
            resize += self.data_config.get("resize_test", 0.0)
            if scale is not None:
                resize = scale
            resize_dims = (int(w * resize), int(h * resize))
            new_w, new_h = resize_dims
            crop_h = int((1 - np.mean(self.data_config["crop_h"])) *
                         new_h) - fh
            crop_w = int(max(0, new_w - fw) / 2)
            crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
            do_flip = False if flip is None else flip
            rotate = 0.0
        return resize, resize_dims, crop, do_flip, rotate

    def img_transform_core(self, img, resize_dims, crop, flip, rotate):
        from PIL import Image
        img = img.resize(resize_dims)
        img = img.crop(crop)
        if flip:
            img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
        img = img.rotate(rotate)
        return img

    def img_transform(self, img, post_rot, post_tran, resize,
                      resize_dims, crop, flip, rotate):
        """Apply + track the aug homography (reference :178-196)."""
        img = self.img_transform_core(img, resize_dims, crop, flip,
                                      rotate)
        post_rot = post_rot * resize
        post_tran = post_tran - np.asarray(crop[:2], np.float32)
        if flip:
            a = np.array([[-1, 0], [0, 1]], np.float32)
            b = np.array([crop[2] - crop[0], 0], np.float32)
            post_rot = a @ post_rot
            post_tran = a @ post_tran + b
        a = _rot2(rotate / 180 * np.pi)
        b = np.array([crop[2] - crop[0], crop[3] - crop[1]],
                     np.float32) / 2
        b = a @ (-b) + b
        post_rot = a @ post_rot
        post_tran = a @ post_tran + b
        return img, post_rot, post_tran

    def choose_cams(self):
        cams = self.data_config["cams"]
        n = self.data_config.get("Ncams", len(cams))
        if self.is_train and n < len(cams):
            return list(np.random.choice(cams, n, replace=False))
        return list(cams)

    def _resolve(self, path: str) -> str:
        if self.root_path:
            i = path.find("samples")
            if i >= 0:
                return osp.join(osp.abspath(self.root_path), path[i:])
        return path

    def get_inputs(self, results, flip=None, scale=None):
        from PIL import Image
        cams = self.choose_cams()
        imgs_cur, imgs_adj = [], []
        rots, trans, intrins, post_rots, post_trans = [], [], [], [], []
        for cam in cams:
            cam_data = results["img_info"][cam]
            img = Image.open(self._resolve(cam_data["data_path"]))
            post_rot = np.eye(2, dtype=np.float32)
            post_tran = np.zeros(2, np.float32)
            intrin = np.asarray(cam_data["cam_intrinsic"], np.float32)
            rot = np.asarray(cam_data["sensor2lidar_rotation"],
                             np.float32)
            tran = np.asarray(cam_data["sensor2lidar_translation"],
                              np.float32)
            aug = self.sample_augmentation(img.height, img.width,
                                           flip=flip, scale=scale)
            resize, resize_dims, crop, do_flip, rotate = aug
            if self.fast_jpeg_decode:
                img.draft("RGB", resize_dims)
            img, post_rot2, post_tran2 = self.img_transform(
                img, post_rot, post_tran, resize, resize_dims, crop,
                do_flip, rotate)
            pr3 = np.eye(3, dtype=np.float32)
            pr3[:2, :2] = post_rot2
            pt3 = np.zeros(3, np.float32)
            pt3[:2] = post_tran2
            imgs_cur.append(normalize_img(img, self.bevdepth_norm))
            if self.sequential:
                adj = results["adjacent"]
                adj_list = adj if isinstance(adj, list) else [adj]
                for a_info in adj_list:
                    img_a = Image.open(self._resolve(
                        a_info["cams"][cam]["data_path"]))
                    if self.fast_jpeg_decode:
                        img_a.draft("RGB", resize_dims)
                    img_a = self.img_transform_core(
                        img_a, resize_dims, crop, do_flip, rotate)
                    imgs_adj.append(normalize_img(img_a,
                                                  self.bevdepth_norm))
            intrins.append(intrin)
            rots.append(rot)
            trans.append(tran)
            post_rots.append(pr3)
            post_trans.append(pt3)

        n = len(cams)
        imgs = np.stack(imgs_cur + imgs_adj)           # [F*N, H, W, 3]
        rots = np.stack(rots)
        trans = np.stack(trans)
        intrins = np.stack(intrins)
        post_rots = np.stack(post_rots)
        post_trans = np.stack(post_trans)
        if not self.sequential:
            return (imgs, rots[None], trans[None], intrins[None],
                    post_rots[None], post_trans[None])

        # adjacent-frame extrinsics, ego-aligned into the current lidar
        # frame (reference :317-384)
        rots_adj, trans_adj = self._aligned_adjacent(results, rots, trans)
        return (imgs,
                np.stack([rots, rots_adj]),
                np.stack([trans, trans_adj]),
                np.stack([intrins, intrins]),
                np.stack([post_rots, post_rots]),
                np.stack([post_trans, post_trans]))

    def _aligned_adjacent(self, results, rots, trans):
        curr, adj = results["curr"], results["adjacent"]
        if isinstance(adj, list):
            adj = adj[0]
        if not self.aligned:
            return rots.copy(), trans.copy()
        # scene-boundary sample: the dataset substituted the current
        # frame as its own adjacent (nuscenes_dataset._select_adjacent),
        # whose stub dict has no ego2global keys — the alignment is the
        # identity, return before touching them
        if results.get("adjacent_type") == "curr":
            return rots.copy(), trans.copy()
        if self.trans_only:
            posi_curr = np.asarray(curr["ego2global_translation"],
                                   np.float32)
            posi_adj = np.asarray(adj["ego2global_translation"],
                                  np.float32)
            shift_global = posi_adj - posi_curr
            from ...utils.geometry import quat_to_rotmat
            l2e_r = quat_to_rotmat(curr["lidar2ego_rotation"])
            e2g_r = quat_to_rotmat(curr["ego2global_rotation"])
            shift_lidar = shift_global @ np.linalg.inv(e2g_r).T @ \
                np.linalg.inv(l2e_r).T
            return rots.copy(), trans + shift_lidar.astype(np.float32)
        ego_curr2g = make_transform(curr["ego2global_rotation"],
                                    curr["ego2global_translation"])
        ego_adj2g = make_transform(adj["ego2global_rotation"],
                                   adj["ego2global_translation"])
        l2e = make_transform(curr["lidar2ego_rotation"],
                             curr["lidar2ego_translation"])
        adj2curr = invert_transform(l2e) @ invert_transform(ego_curr2g) \
            @ ego_adj2g @ l2e
        if results.get("adjacent_type") == "curr":
            adj2curr = np.eye(4)
        rots_new, trans_new = [], []
        for r, t in zip(rots, trans):
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = t
            m = adj2curr @ m
            rots_new.append(m[:3, :3].astype(np.float32))
            trans_new.append(m[:3, 3].astype(np.float32))
        return np.stack(rots_new), np.stack(trans_new)

    def __call__(self, results):
        results["img_inputs"] = self.get_inputs(results)
        return results


@PIPELINES.register_module()
class LoadMultiViewImageFromFiles_BEVDepth(
        LoadMultiViewImageFromFiles_BEVDet):
    """BEVDepth variant — identical camera handling here; kept as a
    distinct registered name for config parity (reference
    loading.py:_BEVDepth subclass adds sensor2ego outputs used only by
    the reproduce-official transformer)."""


@PIPELINES.register_module()
class PointToMultiViewDepth:
    """lidar points -> per-camera sparse min-depth maps at feature
    resolution (reference loading.py:18-61)."""

    def __init__(self, grid_config=None, downsample: int = 16):
        self.downsample = downsample
        self.grid_config = dict(grid_config) if grid_config else {
            "dbound": [1.0, 60.0, 1.0]}

    def points2depthmap(self, points_img: np.ndarray, height: int,
                        width: int) -> np.ndarray:
        """points_img [P, 3] = (u, v, depth) in augmented image coords."""
        h, w = height // self.downsample, width // self.downsample
        depth_map = np.zeros((h, w), np.float32)
        coor = np.round(points_img[:, :2] / self.downsample).astype(
            np.int64)
        depth = points_img[:, 2]
        kept = ((coor[:, 0] >= 0) & (coor[:, 0] < w) &
                (coor[:, 1] >= 0) & (coor[:, 1] < h) &
                (depth < self.grid_config["dbound"][1]) &
                (depth >= self.grid_config["dbound"][0]))
        coor, depth = coor[kept], depth[kept]
        # min depth per pixel via rank sort (reference :40-52)
        ranks = coor[:, 0] + coor[:, 1] * w
        sort = (ranks + depth / 100.0).argsort()
        coor, depth, ranks = coor[sort], depth[sort], ranks[sort]
        kept = np.ones(coor.shape[0], bool)
        kept[1:] = ranks[1:] != ranks[:-1]
        coor, depth = coor[kept], depth[kept]
        depth_map[coor[:, 1], coor[:, 0]] = depth
        return depth_map

    def __call__(self, results):
        imgs, rots, trans, intrins, post_rots, post_trans = \
            results["img_inputs"][:6]
        points = results["points"].tensor[:, :3]
        n = rots.shape[1]
        h, w = imgs.shape[1], imgs.shape[2]
        from ... import native
        nat = native.points_to_depth_maps(
            points, rots[0, :n], trans[0, :n], intrins[0, :n],
            post_rots[0, :n], post_trans[0, :n], h, w, self.downsample,
            self.grid_config["dbound"][0], self.grid_config["dbound"][1])
        if nat is not None:
            results["img_inputs"] = tuple(
                results["img_inputs"][:6]) + (nat,)
            return results
        depth_maps = []
        for cid in range(n):
            # lidar -> cam
            cam2lidar_r = rots[0, cid]
            cam2lidar_t = trans[0, cid]
            pts_cam = (points - cam2lidar_t) @ cam2lidar_r
            # cam -> image plane
            k = intrins[0, cid]
            depth = pts_cam[:, 2]
            uv = pts_cam[:, :2] / np.maximum(depth[:, None], 1e-5)
            uv = uv @ k[:2, :2].T + k[:2, 2]
            # apply image augmentation homography
            uv = uv @ post_rots[0, cid][:2, :2].T + \
                post_trans[0, cid][:2]
            pts_img = np.concatenate([uv, depth[:, None]], axis=-1)
            pts_img = pts_img[depth > 0]
            depth_maps.append(self.points2depthmap(pts_img, h, w))
        results["img_inputs"] = tuple(results["img_inputs"][:6]) + \
            (np.stack(depth_maps),)
        return results


@PIPELINES.register_module()
class LoadPointsFromFile:
    """Load a point cloud; ``virtual=True`` merges MVP virtual points to
    17 dims with virtual-flag + timestamp channels (reference
    loading.py:1171-1206)."""

    def __init__(self, coord_type: str = "LIDAR", load_dim: int = 5,
                 use_dim=(0, 1, 2, 3), shift_height: bool = False,
                 use_color: bool = False, file_client_args=None,
                 virtual: bool = False):
        self.load_dim = load_dim
        self.use_dim = list(use_dim) if not isinstance(use_dim, int) \
            else list(range(use_dim))
        self.virtual = virtual

    def _load(self, path: str) -> np.ndarray:
        if path.endswith(".npy"):
            return np.load(path)
        return np.fromfile(path, dtype=np.float32).reshape(
            -1, self.load_dim)

    def __call__(self, results):
        path = results["pts_filename"]
        if self.virtual:
            # MVP: companion *_VIRTUAL .pkl.npy with real + virtual points
            vpath = path.replace("samples", "samples_VIRTUAL") + \
                ".pkl.npy"
            data = np.load(vpath, allow_pickle=True).item()
            real = np.asarray(data["real_points"], np.float32)
            virtual = np.asarray(data["virtual_points"], np.float32)
            # real: flag 0; virtual: flag -1 (relabeled to 1 by the VFE)
            real_full = np.concatenate(
                [real, np.zeros((real.shape[0], 1), np.float32)], -1)
            virt_full = np.concatenate(
                [virtual, -np.ones((virtual.shape[0], 1), np.float32)],
                -1)
            pts = np.concatenate([real_full, virt_full], axis=0)
            # pad/append timestamp channel
            pts = np.concatenate(
                [pts, np.zeros((pts.shape[0], 1), np.float32)], -1)
        else:
            pts = self._load(path)[:, self.use_dim]
        results["points"] = LiDARPoints(pts, points_dim=pts.shape[-1])
        return results


@PIPELINES.register_module()
class LoadPointsFromMultiSweeps:
    """Aggregate N sweeps with a time-lag channel (reference
    loading.py:654-956)."""

    def __init__(self, sweeps_num: int = 10, load_dim: int = 5,
                 use_dim=(0, 1, 2, 4), pad_empty_sweeps: bool = False,
                 remove_close: bool = False, test_mode: bool = False,
                 file_client_args=None, virtual: bool = False,
                 use_native: bool = False, native_max_points: int = 0):
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode
        self.use_native = use_native
        self.native_max_points = native_max_points

    def _remove_close(self, pts: np.ndarray, radius: float = 1.0):
        return pts[(np.abs(pts[:, 0]) >= radius) |
                   (np.abs(pts[:, 1]) >= radius)]

    def _native_call(self, results):
        """Fused C++ load+transform+concat across key frame + sweeps
        (distillbev_tpu/native); returns None when ineligible."""
        from ... import native
        sweeps = results.get("sweeps", [])
        key_path = results.get("pts_filename", "")
        if not (native.available() and key_path.endswith(".bin") and
                all(s.get("data_path", "").endswith(".bin")
                    for s in sweeps)):
            return None
        if len(sweeps) > self.sweeps_num:
            if self.test_mode:
                choices = list(range(self.sweeps_num))
            else:
                choices = list(np.random.choice(
                    len(sweeps), self.sweeps_num, replace=False))
            sweeps = [sweeps[i] for i in choices]
        paths = [key_path] + [s["data_path"] for s in sweeps]
        rots = [np.eye(3, dtype=np.float32)] + [
            np.asarray(s["sensor2lidar_rotation"], np.float32)
            for s in sweeps]
        trans = [np.zeros(3, np.float32)] + [
            np.asarray(s["sensor2lidar_translation"], np.float32)
            for s in sweeps]
        ts = results["timestamp"]
        lags = [0.0] + [ts - s["timestamp"] / 1e6 for s in sweeps]
        max_pts = self.native_max_points or             (1 + len(sweeps)) * 40_000
        out, n = native.aggregate_sweeps(
            paths, np.stack(rots), np.stack(trans),
            np.asarray(lags, np.float32), self.load_dim, self.use_dim,
            max_pts,
            remove_close=1.0 if self.remove_close else 0.0)
        results["points"] = LiDARPoints(out[:n],
                                        points_dim=out.shape[-1])
        return results

    def __call__(self, results):
        if self.use_native:
            out = self._native_call(results)
            if out is not None:
                return out
        points = results["points"]
        pts = points.tensor
        # key frame gets a zero time-lag column
        base = np.concatenate(
            [pts[:, self.use_dim],
             np.zeros((pts.shape[0], 1), np.float32)], -1)
        sweep_pts = [base]
        ts = results["timestamp"]
        sweeps = results.get("sweeps", [])
        if len(sweeps) == 0 and self.pad_empty_sweeps:
            for _ in range(self.sweeps_num):
                sweep_pts.append(self._remove_close(base)
                                 if self.remove_close else base)
        else:
            if len(sweeps) <= self.sweeps_num:
                choices = np.arange(len(sweeps))
            elif self.test_mode:
                choices = np.arange(self.sweeps_num)
            else:
                choices = np.random.choice(len(sweeps), self.sweeps_num,
                                           replace=False)
            for i in choices:
                sweep = sweeps[i]
                p = np.fromfile(sweep["data_path"],
                                dtype=np.float32).reshape(
                    -1, self.load_dim)
                if self.remove_close:
                    p = self._remove_close(p)
                sweep_ts = sweep["timestamp"] / 1e6
                r = np.asarray(sweep["sensor2lidar_rotation"],
                               np.float32)
                t = np.asarray(sweep["sensor2lidar_translation"],
                               np.float32)
                p[:, :3] = p[:, :3] @ r.T + t
                lag = ts - sweep_ts
                sweep_pts.append(np.concatenate(
                    [p[:, self.use_dim],
                     np.full((p.shape[0], 1), lag, np.float32)], -1))
        merged = np.concatenate(sweep_pts, axis=0)
        results["points"] = LiDARPoints(merged,
                                        points_dim=merged.shape[-1])
        return results


@PIPELINES.register_module()
class LoadAnnotations3D:
    """Unpack ann_info into top-level keys (reference loading.py)."""

    def __init__(self, with_bbox_3d: bool = True,
                 with_label_3d: bool = True, **kwargs):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d

    def __call__(self, results):
        ann = results.get("ann_info", {})
        if self.with_bbox_3d:
            results["gt_bboxes_3d"] = ann["gt_bboxes_3d"]
        if self.with_label_3d:
            results["gt_labels_3d"] = ann["gt_labels_3d"]
        return results
