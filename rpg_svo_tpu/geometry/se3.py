"""SE(3) rigid transforms as a JAX pytree.

TPU-native replacement for the reference's Sophus::SE3 dependency
(used e.g. at svo/src/sparse_img_align.cpp:257 for ``T * SE3::exp(-x)``).
Stored as an explicit rotation matrix + translation so compose/apply are
plain (batched) matmuls that map onto the MXU; exp/log use closed-form
Rodrigues with Taylor fallbacks so they are jit/vmap-safe at any batch rank.

Twist convention matches the reference: 6-vector = (v, w) with translation
part first, rotation part last (see jacobian column layout in
svo/include/svo/frame.h:116-138).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _mm3(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matmul as broadcast-multiply-reduce (see _mv3)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mv3(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matrix-vector product as a broadcast-multiply-reduce.

    Equivalent to einsum("...ij,...j->...i") but lowers to an
    elementwise+reduce that XLA fuses with neighboring ops, instead of a
    tiny dot_general kernel (the fused VO step is kernel-count-bound)."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def _vee(W: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


class SE3(NamedTuple):
    """Rigid transform; supports arbitrary leading batch dims."""
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    # -- constructors -------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    @staticmethod
    def exp(xi: jnp.ndarray) -> "SE3":
        """Exponential map of twist xi = (v, w), (..., 6) -> SE3."""
        v, w = xi[..., :3], xi[..., 3:]
        theta2 = jnp.sum(w * w, axis=-1)
        theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
        W = _hat(w)
        W2 = _mm3(W, W)
        # sin(t)/t, (1-cos t)/t^2, (t - sin t)/t^3 with Taylor fallbacks
        small = theta2 < _EPS
        st = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
        ct = jnp.where(small, 0.5 - theta2 / 24.0,
                       (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
        vt = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                       (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
        R = eye + st[..., None, None] * W + ct[..., None, None] * W2
        V = eye + ct[..., None, None] * W + vt[..., None, None] * W2
        t = _mv3(V, v)
        return SE3(R, t)

    def log(self) -> jnp.ndarray:
        """Logarithm map -> twist (..., 6) = (v, w)."""
        R, t = self.R, self.t
        trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
        cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
        theta = jnp.arccos(cos_theta)
        theta2 = theta * theta
        small = theta < 1e-4
        # w = theta / (2 sin theta) * vee(R - R^T)
        factor = jnp.where(small, 0.5 + theta2 / 12.0,
                           theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))))
        w = factor[..., None] * _vee(R - jnp.swapaxes(R, -1, -2))
        W = _hat(w)
        W2 = _mm3(W, W)
        # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
        denom = 2.0 * (1.0 - jnp.cos(theta))
        coef = jnp.where(
            small, 1.0 / 12.0 + theta2 / 720.0,
            (1.0 - theta * jnp.sin(jnp.where(small, 1.0, theta))
             / jnp.where(small, 1.0, denom)) / jnp.where(small, 1.0, theta2))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), W.shape)
        Vinv = eye - 0.5 * W + coef[..., None, None] * W2
        v = _mv3(Vinv, t)
        return jnp.concatenate([v, w], axis=-1)

    # -- group ops -----------------------------------------------------
    def __mul__(self, other: "SE3") -> "SE3":
        return SE3(_mm3(self.R, other.R),
                   _mv3(self.R, other.t) + self.t)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -_mv3(Rt, self.t))

    def apply(self, p: jnp.ndarray) -> jnp.ndarray:
        """Transform points p (..., 3)."""
        return _mv3(self.R, p) + self.t

    def rotate(self, p: jnp.ndarray) -> jnp.ndarray:
        return _mv3(self.R, p)

    def adjoint(self) -> jnp.ndarray:
        """Adjoint matrix (..., 6, 6) in (v, w) twist ordering."""
        tR = _mm3(_hat(self.t), self.R)
        zeros = jnp.zeros_like(self.R)
        top = jnp.concatenate([self.R, tR], axis=-1)
        bot = jnp.concatenate([zeros, self.R], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def matrix(self) -> jnp.ndarray:
        """Homogeneous 4x4 matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype), (*batch, 1, 4))
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(M: jnp.ndarray) -> "SE3":
        return SE3(M[..., :3, :3], M[..., :3, 3])

    def normalize(self) -> "SE3":
        """Re-orthonormalize R via Gram-Schmidt (drift control in long runs)."""
        r0 = self.R[..., 0, :]
        r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
        r1 = self.R[..., 1, :]
        r1 = r1 - jnp.sum(r0 * r1, axis=-1, keepdims=True) * r0
        r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
        r2 = jnp.cross(r0, r1)
        return SE3(jnp.stack([r0, r1, r2], axis=-2), self.t)


def hat(w: jnp.ndarray) -> jnp.ndarray:
    return _hat(w)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ], axis=-2)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (x, y, z, w), branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best by max pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01),
                    4.0 * qw0 * qw0], axis=-1) / (4.0 * qw0[..., None])
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20),
                    (m21 - m12)], axis=-1) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21),
                    (m02 - m20)], axis=-1) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3,
                    (m10 - m01)], axis=-1) / (4.0 * qz3[..., None])
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
