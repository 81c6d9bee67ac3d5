"""Batched Pose and Camera pytrees (reference `gluefactory/geometry/wrappers.py:52-508`).

Instead of the reference's tensor-wrapper class hierarchy, these are
`flax.struct` dataclasses registered as JAX pytrees, so they flow through
`jit`/`vmap`/`pjit` and shard like any array. All ops are batched over
arbitrary leading dims.

Camera supports three models (static, non-pytree field): "pinhole",
"radial" (polynomial), and "kb4" (Kannala-Brandt fisheye for Endomapper,
reference `wrappers.py:240-283`).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .utils import (
    EPS,
    J_distort_points_kb4,
    J_distort_points_radial,
    distort_points_kb4,
    distort_points_radial,
    from_homogeneous,
    so3exp_map,
    to_homogeneous,
    undistort_points_kb4,
    undistort_points_radial,
)


@flax.struct.dataclass
class Pose:
    """Rigid transform T: x_dst = R @ x_src + t. R: (..., 3, 3); t: (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_Rt(cls, R, t) -> "Pose":
        return cls(R=jnp.asarray(R), t=jnp.asarray(t))

    @classmethod
    def from_aa(cls, aa, t) -> "Pose":
        return cls(R=so3exp_map(jnp.asarray(aa)), t=jnp.asarray(t))

    @classmethod
    def from_4x4mat(cls, T) -> "Pose":
        T = jnp.asarray(T)
        return cls(R=T[..., :3, :3], t=T[..., :3, 3])

    @classmethod
    def from_colmap(cls, qvec, tvec) -> "Pose":
        """COLMAP convention: qvec = (w, x, y, z), world->cam."""
        q = np.asarray(qvec, np.float64)
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        w, x, y, z = (q[..., i] for i in range(4))
        R = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        ).reshape(q.shape[:-1] + (3, 3))
        return cls(R=jnp.asarray(R, jnp.float32), t=jnp.asarray(tvec, jnp.float32))

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype)
        return cls(R=R, t=t)

    # -- core ops ------------------------------------------------------------
    @property
    def shape(self):
        return self.t.shape[:-1]

    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        T = jnp.zeros(self.shape + (4, 4), self.R.dtype)
        T = T.at[..., :3, :3].set(self.R)
        T = T.at[..., :3, 3].set(self.t)
        T = T.at[..., 3, 3].set(1.0)
        return T

    def inv(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(R=Rt, t=-jnp.einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "Pose") -> "Pose":
        """self @ other: first apply `other`, then `self`."""
        return Pose(
            R=self.R @ other.R,
            t=jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def __matmul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def transform(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 3)."""
        return jnp.einsum("...ij,...nj->...ni", self.R, p3d) + self.t[..., None, :]

    def J_transform(self, p3d_out: jnp.ndarray) -> jnp.ndarray:
        """Jacobian of transform wrt a left-multiplied se3 perturbation.

        p3d_out: transformed points (..., N, 3) -> (..., N, 3, 6) [d/dt, d/dw].
        """
        eye = jnp.broadcast_to(jnp.eye(3, dtype=p3d_out.dtype), p3d_out.shape + (3,))
        from .utils import skew_symmetric

        return jnp.concatenate([eye, -skew_symmetric(p3d_out)], axis=-1)

    def magnitude(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(rotation angle in degrees, translation norm)."""
        trace = jnp.trace(self.R, axis1=-2, axis2=-1)
        cos = jnp.clip((trace - 1) / 2, -1.0, 1.0)
        dr = jnp.rad2deg(jnp.arccos(cos))
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    def __getitem__(self, idx) -> "Pose":
        return Pose(R=self.R[idx], t=self.t[idx])

    def float(self) -> "Pose":
        return Pose(R=self.R.astype(jnp.float32), t=self.t.astype(jnp.float32))


CAMERA_MODELS = ("pinhole", "radial", "kb4")


@flax.struct.dataclass
class Camera:
    """Batched camera: size (..., 2)=(w,h), f (..., 2), c (..., 2), dist (..., K).

    `model` is a static (non-pytree) field so jit specializes per model.
    """

    size: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    dist: jnp.ndarray
    model: str = flax.struct.field(pytree_node=False, default="pinhole")

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_data(cls, camera) -> "Camera":
        """From flat array (..., 6/8/10): (w, h, fx, fy, cx, cy, k...).

        Mirrors the reference's flat-tensor camera layout (`wrappers.py:246-263`).
        6 params -> pinhole, 8 -> radial(k1,k2), 10 -> kb4(k1..k4).
        """
        camera = jnp.asarray(camera)
        D = camera.shape[-1]
        model = {6: "pinhole", 8: "radial", 10: "kb4"}[D]
        return cls(
            size=camera[..., 0:2],
            f=camera[..., 2:4],
            c=camera[..., 4:6],
            dist=camera[..., 6:],
            model=model,
        )

    @classmethod
    def from_calibration_matrix(cls, K, size=None) -> "Camera":
        K = jnp.asarray(K)
        f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], -1)
        c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], -1)
        if size is None:
            size = 2 * c  # guess: principal point at center
        else:
            size = jnp.broadcast_to(jnp.asarray(size, K.dtype), c.shape)
        return cls(size=size, f=f, c=c, dist=jnp.zeros(f.shape[:-1] + (0,), K.dtype))

    @classmethod
    def from_colmap(cls, camera: dict) -> "Camera":
        """From a COLMAP camera dict (reference `wrappers.py:264-282`)."""
        model = camera["model"]
        params = np.asarray(camera["params"], np.float32)
        size = np.array([camera["width"], camera["height"]], np.float32)
        if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
            f = np.stack([params[..., 0], params[..., 0]], -1)
            c = params[..., 1:3]
            k = params[..., 3:]
        elif model in ("PINHOLE", "OPENCV", "OPENCV_FISHEYE", "FULL_OPENCV"):
            f = params[..., 0:2]
            c = params[..., 2:4]
            k = params[..., 4:]
        else:
            raise ValueError(f"unsupported COLMAP model {model}")
        if model == "OPENCV_FISHEYE":
            m, k = "kb4", k[..., :4]
        elif k.shape[-1] == 0:
            m = "pinhole"
        else:
            m, k = "radial", k[..., :2]
        return cls(
            size=jnp.asarray(np.broadcast_to(size, f.shape)),
            f=jnp.asarray(f), c=jnp.asarray(c), dist=jnp.asarray(k), model=m,
        )

    @classmethod
    def from_npz(cls, data: dict) -> "Camera":
        """KB4 camera from Endomapper npz fields (reference `wrappers.py:283`)."""
        return cls(
            size=jnp.asarray(data["size"], jnp.float32),
            f=jnp.asarray(data["f"], jnp.float32),
            c=jnp.asarray(data["c"], jnp.float32),
            dist=jnp.asarray(data["dist"], jnp.float32)[..., :4],
            model="kb4",
        )

    # -- properties ----------------------------------------------------------
    @property
    def shape(self):
        return self.f.shape[:-1]

    def calibration_matrix(self) -> jnp.ndarray:
        K = jnp.zeros(self.shape + (3, 3), self.f.dtype)
        K = K.at[..., 0, 0].set(self.f[..., 0])
        K = K.at[..., 1, 1].set(self.f[..., 1])
        K = K.at[..., 0, 2].set(self.c[..., 0])
        K = K.at[..., 1, 2].set(self.c[..., 1])
        K = K.at[..., 2, 2].set(1.0)
        return K

    def to_cameradict(self) -> dict:
        """PoseLib/COLMAP-style dict (host-side; reference `wrappers.py:460`)."""
        size = np.asarray(self.size)
        f = np.asarray(self.f)
        c = np.asarray(self.c)
        k = np.asarray(self.dist)
        model = {"pinhole": "PINHOLE", "radial": "RADIAL", "kb4": "OPENCV_FISHEYE"}[
            self.model
        ]
        params = list(f.reshape(-1)) + list(c.reshape(-1)) + list(k.reshape(-1))
        return {
            "model": model,
            "width": int(size.reshape(-1)[0]),
            "height": int(size.reshape(-1)[1]),
            "params": params,
        }

    # -- geometric transforms ------------------------------------------------
    def scale(self, scales) -> "Camera":
        """Rescale the image by per-axis `scales` (..., 2) or scalar."""
        s = jnp.broadcast_to(jnp.asarray(scales, self.f.dtype), self.size.shape)
        return self.replace(size=self.size * s, f=self.f * s, c=self.c * s)

    def crop(self, left_top, size) -> "Camera":
        """Crop with top-left corner `left_top` (..., 2) and new `size` (..., 2)."""
        lt = jnp.broadcast_to(jnp.asarray(left_top, self.c.dtype), self.c.shape)
        sz = jnp.broadcast_to(jnp.asarray(size, self.size.dtype), self.size.shape)
        return self.replace(size=sz, c=self.c - lt)

    # -- projection chain ----------------------------------------------------
    def project(self, p3d: jnp.ndarray):
        """Perspective division (..., N, 3) -> ((..., N, 2), valid (..., N))."""
        z = p3d[..., -1]
        valid = z > EPS
        z_safe = jnp.where(valid, z, jnp.ones_like(z))
        return p3d[..., :-1] / z_safe[..., None], valid

    def J_project(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Jacobian of `project` wrt p3d: (..., N, 2, 3)."""
        x, y, z = p3d[..., 0], p3d[..., 1], p3d[..., 2]
        zi = 1.0 / jnp.maximum(z, EPS)
        o = jnp.zeros_like(zi)
        return jnp.stack(
            [zi, o, -x * zi**2, o, zi, -y * zi**2], axis=-1
        ).reshape(p3d.shape[:-1] + (2, 3))

    def distort(self, pts: jnp.ndarray):
        if self.model == "pinhole" or self.dist.shape[-1] == 0:
            return pts, jnp.ones(pts.shape[:-1], bool)
        if self.model == "radial":
            return distort_points_radial(pts, self.dist)
        if self.model == "kb4":
            return distort_points_kb4(pts, self.dist)
        raise ValueError(self.model)

    def J_distort(self, pts: jnp.ndarray) -> jnp.ndarray:
        if self.model == "pinhole" or self.dist.shape[-1] == 0:
            return jnp.broadcast_to(jnp.eye(2, pts.dtype), pts.shape + (2,))
        if self.model == "radial":
            return J_distort_points_radial(pts, self.dist)
        if self.model == "kb4":
            return J_distort_points_kb4(pts, self.dist)
        raise ValueError(self.model)

    def undistort(self, pts: jnp.ndarray):
        if self.model == "pinhole" or self.dist.shape[-1] == 0:
            return pts, jnp.ones(pts.shape[:-1], bool)
        if self.model == "radial":
            return undistort_points_radial(pts, self.dist)
        if self.model == "kb4":
            return undistort_points_kb4(pts, self.dist)
        raise ValueError(self.model)

    def denormalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def world2image(self, p3d: jnp.ndarray):
        """(..., N, 3) -> ((..., N, 2) pixels, valid)."""
        p2d, visible = self.project(p3d)
        p2d, mask = self.distort(p2d)
        return self.denormalize(p2d), visible & mask

    def J_world2image(self, p3d: jnp.ndarray):
        """Jacobian (..., N, 2, 3) of world2image, and validity."""
        p2d, valid = self.project(p3d)
        J_dist = self.J_distort(p2d)
        J_proj = self.J_project(p3d)
        J = self.f[..., None, :, None] * (J_dist @ J_proj)
        return J, valid

    def image2world(self, p2d: jnp.ndarray):
        """Pixels -> unit-plane rays (..., N, 3) as homogeneous (x, y, 1)."""
        pts = self.normalize(p2d)
        pts, valid = self.undistort(pts)
        return to_homogeneous(pts), valid

    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """True where pixel coords fall inside the image."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def __getitem__(self, idx) -> "Camera":
        return Camera(
            size=self.size[idx], f=self.f[idx], c=self.c[idx], dist=self.dist[idx],
            model=self.model,
        )

    def float(self) -> "Camera":
        return jax.tree.map(lambda x: x.astype(jnp.float32), self)


__all__ = ["Pose", "Camera", "to_homogeneous", "from_homogeneous", "CAMERA_MODELS"]
