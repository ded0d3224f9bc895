"""Datasets: MVR image/mask/camera directories and DTU cameras.npz.

Parity: reference DSS/utils/dataset.py — `MVRDataset` (:16, directory
of image/ mask/ [depth/] + data_dict.npz with camera_mat (B,4,4),
points/normals/colors, lights+camera params) and `DTUDataset` (:231,
IDR-style cameras.npz with world_mat_%d / scale_mat_%d and intrinsics
from camera_mat_0 with negated focal/principal, :329-341).

Host-side numpy loaders returning channels-last float32 arrays; the
training loop batches them into device arrays (the only process
boundary in the system, like the reference's DataLoader workers —
SURVEY.md §3.1).
"""

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.logger import get_logger
from isopoints_tpu.utils.io import load_image, read_ply


def decompose_camera_matrix(cam_mat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(4,4) row-vector world->view matrix -> (R (3,3), T (3,))."""
    return cam_mat[:3, :3], cam_mat[3, :3]


class MVRDataset:
    """Multiview reconstruction dataset (dataset.py:16-229).

    Layout: data_dir/{image,mask[,depth]}/*.png + data_dir/data_dict.npz
    holding `cameras.camera_mat` (B,4,4) world->view (row-vector),
    camera intrinsics under `camera.focal_length`/`principal_point`,
    and optional points/normals/colors arrays.
    """

    def __init__(self, data_dir: str, img_extension: str = "png",
                 load_dense_depth: bool = False):
        self.data_dir = data_dir
        data_dict = np.load(os.path.join(data_dir, "data_dict.npz"),
                            allow_pickle=True)
        self.camera_mat = np.asarray(data_dict["camera_mat"], np.float32)
        self.focal_length = np.asarray(
            data_dict.get("focal_length", np.array([1.0, 1.0])), np.float32)
        self.principal_point = np.asarray(
            data_dict.get("principal_point", np.array([0.0, 0.0])), np.float32)
        for k in ("points", "normals", "colors"):
            setattr(self, k, np.asarray(data_dict[k], np.float32)
                    if k in data_dict else None)

        img_dir = os.path.join(data_dir, "image")
        mask_dir = os.path.join(data_dir, "mask")
        self.image_files = sorted(
            f for f in os.listdir(img_dir) if f.endswith(img_extension))
        self.mask_files = sorted(
            f for f in os.listdir(mask_dir) if f.endswith(img_extension))
        if len(self.image_files) != self.camera_mat.shape[0]:
            get_logger().warning("images (%d) != cameras (%d)",
                                 len(self.image_files), self.camera_mat.shape[0])
        self.load_dense_depth = load_dense_depth

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = load_image(os.path.join(self.data_dir, "image",
                                      self.image_files[idx]))[..., :3]
        mask = load_image(os.path.join(self.data_dir, "mask",
                                       self.mask_files[idx]))
        if mask.ndim == 3:
            mask = mask[..., 0]
        item = {
            "img.rgb": img.astype(np.float32),
            "img.mask": (mask > 0.5).astype(np.float32)[..., None],
            "camera_mat": self.camera_mat[idx],
        }
        if self.load_dense_depth:
            # .npy preferred (framework writer); .exr = reference layout
            stem = os.path.splitext(self.image_files[idx])[0]
            dnpy = os.path.join(self.data_dir, "depth", stem + ".npy")
            dexr = os.path.join(self.data_dir, "depth", stem + ".exr")
            if os.path.exists(dnpy):
                item["img.depth"] = np.load(dnpy).astype(np.float32)
            elif os.path.exists(dexr):
                item["img.depth"] = load_image(dexr)
        return item

    def get_pointclouds(self):
        return self.points, self.normals, self.colors

    def camera(self, idx_or_indices) -> PerspectiveCamera:
        idx = np.atleast_1d(np.asarray(idx_or_indices))
        R = np.stack([self.camera_mat[i][:3, :3] for i in idx])
        T = np.stack([self.camera_mat[i][3, :3] for i in idx])
        return PerspectiveCamera.create(
            R=R, T=T, focal_length=self.focal_length,
            principal_point=self.principal_point, batch_size=len(idx))


class DTUDataset:
    """IDR-convention DTU dataset (dataset.py:231-389).

    Layout: data_dir/{image,mask}/*.png + cameras.npz with
    `world_mat_%d` (3,4 or 4,4 projection P = K[R|t]) and
    `scale_mat_%d` normalization. Intrinsics come from decomposing
    P·scale; the pytorch3d camera uses negated focal/principal
    (dataset.py:329-341).
    """

    def __init__(self, data_dir: str, img_extension: str = "png"):
        self.data_dir = data_dir
        cams = np.load(os.path.join(data_dir, "cameras.npz"))
        img_dir = os.path.join(data_dir, "image")
        self.image_files = sorted(
            f for f in os.listdir(img_dir) if f.endswith(img_extension))
        mask_dir = os.path.join(data_dir, "mask")
        self.mask_files = sorted(
            f for f in os.listdir(mask_dir) if f.endswith(img_extension))
        n = len(self.image_files)
        self.world_mats = [cams[f"world_mat_{i}"].astype(np.float32)
                           for i in range(n)]
        self.scale_mats = [cams[f"scale_mat_{i}"].astype(np.float32)
                           for i in range(n)]
        self.intrinsics, self.extrinsics = [], []
        for wm, sm in zip(self.world_mats, self.scale_mats):
            P = (wm @ sm)[:3, :4]
            K, R, t = self._decompose_projection(P)
            self.intrinsics.append(K)
            self.extrinsics.append((R, t))

    @staticmethod
    def _decompose_projection(P: np.ndarray):
        """KRt decomposition via RQ (dataset.py:300-327 / IDR load_K_Rt)."""
        import numpy.linalg as la
        M = P[:3, :3]
        # RQ decomposition through flipped QR
        flip = np.flipud(np.eye(3))
        q, r = la.qr(np.flipud(M).T)
        K = flip @ r.T @ flip
        R = flip @ q.T
        # positive diagonal
        sgn = np.diag(np.sign(np.diag(K)))
        K = K @ sgn
        R = sgn @ R
        if la.det(R) < 0:
            R = -R
            K = -K
        t = la.inv(K) @ P[:3, 3]
        K = K / K[2, 2]
        return K.astype(np.float32), R.astype(np.float32), t.astype(np.float32)

    def get_scale_mat(self) -> np.ndarray:
        """Normalized->world similarity transform (reference
        dataset.py:343-344): apply to generated meshes so chamfer and
        point-face metrics are computed in the scan's original world
        coordinates (reference generate_mvr.py:76-78)."""
        return self.scale_mats[0]

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        img = load_image(os.path.join(self.data_dir, "image",
                                      self.image_files[idx]))[..., :3]
        mask = load_image(os.path.join(self.data_dir, "mask",
                                       self.mask_files[idx]))
        if mask.ndim == 3:
            mask = mask[..., 0]
        return {
            "img.rgb": img.astype(np.float32),
            "img.mask": (mask > 0.5).astype(np.float32)[..., None],
            "idx": np.asarray(idx),
        }

    def camera(self, idx_or_indices, image_size: Tuple[int, int]
               ) -> PerspectiveCamera:
        """pytorch3d-convention camera (negated focal + principal in
        NDC, dataset.py:329-341). R is world->view rotation transposed
        to the row-vector convention; T = t."""
        idx = np.atleast_1d(np.asarray(idx_or_indices))
        h, w = image_size
        Rs, Ts, fls, pps = [], [], [], []
        for i in idx:
            K = self.intrinsics[i]
            R, t = self.extrinsics[i]
            fls.append([-2.0 * K[0, 0] / w, -2.0 * K[1, 1] / h])
            pps.append([-(2.0 * K[0, 2] - w) / w, -(2.0 * K[1, 2] - h) / h])
            Rs.append(R.T)
            Ts.append(t)
        return PerspectiveCamera.create(
            R=np.stack(Rs), T=np.stack(Ts),
            focal_length=np.stack(fls).astype(np.float32),
            principal_point=np.stack(pps).astype(np.float32))

    def get_gt_pointcloud(self, path: Optional[str] = None):
        path = path or os.path.join(self.data_dir, "points.ply")
        if not os.path.exists(path):
            return None
        data = read_ply(path)
        return data


def batch_items(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of dataset items into batched arrays
    (tolerating missing keys like tolerating_collate,
    utils/__init__.py:548-551)."""
    keys = set.intersection(*(set(i.keys()) for i in items))
    return {k: np.stack([i[k] for i in items]) for k in keys}
