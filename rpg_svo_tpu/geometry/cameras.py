"""Camera models as pure JAX functions.

TPU-native replacement for vikit's AbstractCamera / PinholeCamera /
ATANCamera (used throughout the reference, e.g. svo/test/test_pipeline.cpp:48,
svo/src/matcher.cpp and feature bearing vectors in svo/include/svo/feature.h).
Cameras are NamedTuple pytrees of scalars, so they trace cleanly through jit
and vmap and can be carried inside device state.

Conventions (match the reference):
- ``world2cam(xyz_cam)``: 3D point in camera frame -> distorted pixel (u, v).
- ``cam2world(px)``: pixel -> unit-norm bearing vector f in the camera frame.
- unit-plane coordinates: (x/z, y/z).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Pinhole camera with radial-tangential (OpenCV) distortion.

    width/height are floats so the whole struct is a uniform pytree of
    traced scalars; use ints at construction.
    """
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray

    @staticmethod
    def make(width, height, fx, fy, cx, cy,
             k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0) -> "PinholeCamera":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        # STATIC distortion dispatch: with all-zero coefficients the
        # 10-pass unrolled _undistort is pure wasted VPU work on every
        # cam2world call (measured ~0.05 ms/frame of the accurate fused
        # step).  The camera TYPE is part of the jit pytree structure,
        # so returning the ideal subclass compiles the identity path.
        try:
            ideal = all(float(v) == 0.0 for v in (k1, k2, p1, p2, k3))
        except TypeError:          # traced coeffs: keep the full model
            ideal = False
        cls = PinholeCameraIdeal if ideal else PinholeCamera
        return cls(f(fx), f(fy), f(cx), f(cy),
                   f(k1), f(k2), f(p1), f(p2), f(k3),
                   f(width), f(height))

    @property
    def has_distortion(self) -> bool:
        return True  # distortion coeffs may be zero; math is branch-free

    def _distort(self, xu: jnp.ndarray) -> jnp.ndarray:
        """Unit-plane undistorted (..., 2) -> unit-plane distorted (..., 2)."""
        x, y = xu[..., 0], xu[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def _undistort(self, xd: jnp.ndarray) -> jnp.ndarray:
        """Iterative inverse of _distort (OpenCV-style division iteration,
        10 unrolled steps; converges for strong barrel distortion).
        Unrolled rather than fori_loop: straight-line code compiles much
        faster on the TPU backend and fuses into callers."""
        xu = xd
        for _ in range(10):
            x, y = xu[..., 0], xu[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
            tx = 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
            ty = self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
            radial = jnp.where(jnp.abs(radial) < 1e-6, 1e-6, radial)
            xu = jnp.stack([(xd[..., 0] - tx) / radial,
                            (xd[..., 1] - ty) / radial], axis=-1)
        return xu

    def project_unitplane(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Unit-plane (..., 2) -> pixel (..., 2), applying distortion."""
        xd = self._distort(uv)
        u = self.fx * xd[..., 0] + self.cx
        v = self.fy * xd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1)

    def world2cam(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3D point (..., 3) -> pixel (..., 2)."""
        z = xyz[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
        return self.project_unitplane(xyz[..., :2] / zs[..., None])

    def cam2world(self, px: jnp.ndarray) -> jnp.ndarray:
        """Pixel (..., 2) -> unit bearing vector (..., 3)."""
        xd = jnp.stack([(px[..., 0] - self.cx) / self.fx,
                        (px[..., 1] - self.cy) / self.fy], axis=-1)
        xu = self._undistort(xd)
        f = jnp.concatenate([xu, jnp.ones_like(xu[..., :1])], axis=-1)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def is_in_frame(self, px: jnp.ndarray, boundary: float = 0.0,
                    level: int = 0) -> jnp.ndarray:
        """Visibility mask at a pyramid level (ref: Frame::isInFrame)."""
        scale = jnp.float32(2.0 ** level)
        w = self.width / scale
        h = self.height / scale
        u, v = px[..., 0], px[..., 1]
        return ((u >= boundary) & (u < w - boundary) &
                (v >= boundary) & (v < h - boundary))

    @property
    def error_multiplier2(self) -> jnp.ndarray:
        """Focal length for converting unit-plane errors to px (ref vikit)."""
        return self.fx


class PinholeCameraIdeal(PinholeCamera):
    """Distortion-free pinhole: _distort/_undistort are identities.

    Produced by PinholeCamera.make when every coefficient is statically
    zero (the test camera, the synthetic datasets); keeps the exact
    same pytree fields so it drops into every call site, but the jit
    dispatch on the camera type compiles away the distortion math."""

    @property
    def has_distortion(self) -> bool:
        return False

    def _distort(self, xu: jnp.ndarray) -> jnp.ndarray:
        return xu

    def _undistort(self, xd: jnp.ndarray) -> jnp.ndarray:
        return xd


class ATANCamera(NamedTuple):
    """ATAN / FoV distortion camera (Devernay-Faugeras), as in vikit's
    ATANCamera (PTAM-style calibration; svo_ros/param/camera_atan.yaml)."""
    fx: jnp.ndarray  # normalized focal * width, already in px
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    s: jnp.ndarray   # FoV distortion parameter omega
    width: jnp.ndarray
    height: jnp.ndarray

    @staticmethod
    def make(width, height, fx, fy, cx, cy, s) -> "ATANCamera":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        # PTAM-style normalized intrinsics: scale by image size, 0.5 offset
        fx_, fy_ = fx * width, fy * height
        cx_, cy_ = cx * width - 0.5, cy * height - 0.5
        return ATANCamera(f(fx_), f(fy_), f(cx_), f(cy_), f(s),
                          f(width), f(height))

    def _rd_factor(self, ru: jnp.ndarray) -> jnp.ndarray:
        """rd/ru factor for undistorted unit-plane radius ru."""
        two_tan_half = 2.0 * jnp.tan(self.s * 0.5)
        small = ru < 1e-8
        safe = jnp.where(small, 1.0, ru)
        fac = jnp.arctan(safe * two_tan_half) / (safe * self.s)
        return jnp.where(small | (self.s < 1e-8), 1.0, fac)

    def _ru_factor(self, rd: jnp.ndarray) -> jnp.ndarray:
        """ru/rd factor for distorted radius rd (closed-form inverse)."""
        two_tan_half = 2.0 * jnp.tan(self.s * 0.5)
        small = rd < 1e-8
        safe = jnp.where(small, 1.0, rd)
        fac = jnp.tan(safe * self.s) / (safe * two_tan_half)
        return jnp.where(small | (self.s < 1e-8), 1.0, fac)

    def project_unitplane(self, uv: jnp.ndarray) -> jnp.ndarray:
        ru = jnp.linalg.norm(uv, axis=-1)
        fac = self._rd_factor(ru)
        xd = uv * fac[..., None]
        return jnp.stack([self.fx * xd[..., 0] + self.cx,
                          self.fy * xd[..., 1] + self.cy], axis=-1)

    def world2cam(self, xyz: jnp.ndarray) -> jnp.ndarray:
        z = xyz[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
        return self.project_unitplane(xyz[..., :2] / zs[..., None])

    def cam2world(self, px: jnp.ndarray) -> jnp.ndarray:
        xd = jnp.stack([(px[..., 0] - self.cx) / self.fx,
                        (px[..., 1] - self.cy) / self.fy], axis=-1)
        rd = jnp.linalg.norm(xd, axis=-1)
        xu = xd * self._ru_factor(rd)[..., None]
        f = jnp.concatenate([xu, jnp.ones_like(xu[..., :1])], axis=-1)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def is_in_frame(self, px: jnp.ndarray, boundary: float = 0.0,
                    level: int = 0) -> jnp.ndarray:
        scale = jnp.float32(2.0 ** level)
        w = self.width / scale
        h = self.height / scale
        u, v = px[..., 0], px[..., 1]
        return ((u >= boundary) & (u < w - boundary) &
                (v >= boundary) & (v < h - boundary))

    @property
    def error_multiplier2(self) -> jnp.ndarray:
        return self.fx


class OmniCamera(NamedTuple):
    """Omnidirectional (Scaramuzza Ocam) camera, vikit's omni_camera.

    Closes the reference camera abstraction's third option — "ATAN,
    Pinhole or Ocam" (svo/include/svo/frame_handler_mono.h:64; model in
    external vikit).  Calibration follows the ocam toolbox convention:

    - ``poly`` (a0..a4): cam2world polynomial — the mirror-axis
      coordinate of the back-projected ray is z_m = a0 + a2·rho² + ...
      at image radius rho (a1 = 0 in ocam calibrations; a0 < 0, i.e.
      z_m points INTO the mirror).  The framework bearing flips it so
      forward points have z > 0.
    - ``inv_poly`` (b0..b[K-1]): world2cam polynomial rho(theta) with
      theta = atan(z_m / rho_xy) (ocam angle convention).
    - affine stretch [[c, d], [e, 1]] and center (xc, yc) map sensor
      coords to pixels.  (The ocam toolbox stores (row, col); here xc
      is the x/column center, yc the y/row center — load_ocam_calib
      does the swap.)

    Fixed-length coefficient arrays keep the struct a uniform pytree;
    pad unused high-order coefficients with zeros.
    """
    poly: jnp.ndarray       # (5,)
    inv_poly: jnp.ndarray   # (INV_POLY_LEN,)
    xc: jnp.ndarray
    yc: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray
    e: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray

    INV_POLY_LEN = 14       # class attr (not a field): max ocam order

    @staticmethod
    def make(width, height, poly, inv_poly, xc, yc,
             c=1.0, d=0.0, e=0.0) -> "OmniCamera":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        p = jnp.zeros((5,), jnp.float32).at[:len(poly)].set(
            jnp.asarray(poly, jnp.float32))
        ip = jnp.zeros((OmniCamera.INV_POLY_LEN,), jnp.float32)
        ip = ip.at[:len(inv_poly)].set(jnp.asarray(inv_poly, jnp.float32))
        return OmniCamera(p, ip, f(xc), f(yc), f(c), f(d), f(e),
                          f(width), f(height))

    def _polyval(self, coeffs, x):
        """Horner over the fixed-length coeff array (unrolled, static)."""
        n = coeffs.shape[0]
        acc = jnp.broadcast_to(coeffs[n - 1], x.shape)
        for k in range(n - 2, -1, -1):
            acc = acc * x + coeffs[k]
        return acc

    def world2cam(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3D (..., 3), z > 0 forward -> pixel (..., 2)."""
        x, y = xyz[..., 0], xyz[..., 1]
        z_m = -xyz[..., 2]                      # mirror-axis convention
        rho_xy = jnp.sqrt(x * x + y * y)
        safe = jnp.maximum(rho_xy, 1e-10)
        theta = jnp.arctan2(z_m, safe)
        rho = self._polyval(self.inv_poly, theta)
        u = x / safe * rho
        v = y / safe * rho
        return jnp.stack([self.c * u + self.d * v + self.xc,
                          self.e * u + v + self.yc], axis=-1)

    def cam2world(self, px: jnp.ndarray) -> jnp.ndarray:
        """Pixel (..., 2) -> unit bearing (..., 3), z > 0 forward."""
        du = px[..., 0] - self.xc
        dv = px[..., 1] - self.yc
        det = self.c - self.d * self.e
        det = jnp.where(jnp.abs(det) < 1e-10, 1e-10, det)
        u = (du - self.d * dv) / det
        v = (-self.e * du + self.c * dv) / det
        rho = jnp.sqrt(u * u + v * v)
        z_m = self._polyval(self.poly, rho)
        f = jnp.stack([u, v, -z_m], axis=-1)    # flip to z-forward
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def project_unitplane(self, uv: jnp.ndarray) -> jnp.ndarray:
        xyz = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
        return self.world2cam(xyz)

    def is_in_frame(self, px: jnp.ndarray, boundary: float = 0.0,
                    level: int = 0) -> jnp.ndarray:
        scale = jnp.float32(2.0 ** level)
        w = self.width / scale
        h = self.height / scale
        u, v = px[..., 0], px[..., 1]
        return ((u >= boundary) & (u < w - boundary) &
                (v >= boundary) & (v < h - boundary))

    @property
    def fx(self) -> jnp.ndarray:
        """Focal-length equivalent: |d rho / d phi| at the OPTICAL AXIS,
        phi the angle from the axis — what the pipeline's px <->
        unit-plane threshold conversions use (vikit errorMultiplier).

        The axis sits at theta = -pi/2 in the ocam angle convention
        (theta = atan2(z_m, rho_xy)), NOT at theta = 0, so this is the
        inv_poly DERIVATIVE evaluated at -pi/2 — using the first-order
        coefficient alone was measured 2.5x off on the test
        calibration."""
        n = self.inv_poly.shape[0]
        k = jnp.arange(1, n, dtype=jnp.float32)
        dcoef = self.inv_poly[1:] * k          # d(inv_poly)/d(theta)
        return jnp.abs(self._polyval(dcoef, jnp.float32(-jnp.pi / 2)))

    @property
    def error_multiplier2(self) -> jnp.ndarray:
        return self.fx


def load_ocam_calib(path: str) -> "OmniCamera":
    """Parse a Scaramuzza ocam-toolbox `calib_results.txt`.

    Sections (in file order): cam2world poly (count + coeffs), world2cam
    inv poly, center (ROW then COLUMN — swapped into (xc, yc) = (col,
    row) here), affine c/d/e, image size (height, width)."""
    import re
    nums = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            nums.append([float(t) for t in re.findall(
                r"[-+0-9.eE]+", line) if t not in ("e", "E", ".")])
    rows = [r for r in nums if r]
    poly = rows[0][1:]            # first value = coefficient count
    inv_poly = rows[1][1:]
    yc, xc = rows[2][0], rows[2][1]   # ocam stores (row, col)
    c, d, e = rows[3][:3]
    height, width = int(rows[4][0]), int(rows[4][1])
    return OmniCamera.make(width, height, poly, inv_poly, xc, yc, c, d, e)


def project2d(xyz: jnp.ndarray) -> jnp.ndarray:
    """3D -> unit-plane 2D (ref: vk::project2d)."""
    z = xyz[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-10, 1e-10, z)
    return xyz[..., :2] / zs[..., None]


def unproject2d(uv: jnp.ndarray) -> jnp.ndarray:
    """Unit-plane 2D -> homogeneous 3D with z=1."""
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)
