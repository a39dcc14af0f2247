"""Synthetic textured-surface dataset renderer.

Self-contained stand-in for the reference's `sin2_tex2_h1_v8_d` Blender
test dataset (downward camera over a textured sinusoidal surface, 752x480,
ground-truth poses + per-pixel ground-truth depth maps;
svo/test/test_utils.h:30-51, svo/test/README.md).  The original must be
downloaded from rpg.ifi.uzh.ch; here we render an equivalent fixture in
closed form so all tests are hermetic:

- world: a plane z = 0 carrying a band-limited procedural texture with
  strong corner content;
- camera: pinhole (same intrinsics as the reference test camera,
  752x480, f=315.5, c=(376, 240)), flying above the plane looking down;
- per frame: image, ground-truth T_w_c, and ground-truth depth map
  (depth measured along the bearing ray, the convention used by the
  reference's depth filter).

Everything is pure JAX, so frames render on-device in microseconds.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.geometry.cameras import PinholeCamera
from rpg_svo_tpu.geometry.se3 import SE3


def reference_test_camera(width: int = 752, height: int = 480) -> PinholeCamera:
    """The reference's test camera (svo/test/test_pipeline.cpp:48)."""
    return PinholeCamera.make(width, height, 315.5, 315.5,
                              width / 2.0, height / 2.0)


@dataclasses.dataclass(frozen=True)
class Texture:
    """Sum-of-sinusoids texture with per-component random orientation.

    amp (K,), freq (K, 2) rad/m, phase (K,): I(x, y) in roughly [0, 255].
    """
    amp: np.ndarray
    freq: np.ndarray
    phase: np.ndarray

    @staticmethod
    def make(seed: int = 0, n_waves: int = 48,
             min_freq: float = 4.0, max_freq: float = 240.0,
             flat_spectrum: bool = False) -> "Texture":
        rng = np.random.default_rng(seed)
        mag = np.exp(rng.uniform(np.log(min_freq), np.log(max_freq), n_waves))
        ang = rng.uniform(0, 2 * np.pi, n_waves)
        freq = np.stack([mag * np.cos(ang), mag * np.sin(ang)], axis=-1)
        if flat_spectrum:
            # equal power per component: image detail survives down to the
            # shortest wavelength, like a sharp photographic texture
            amp = np.ones(n_waves)
        else:
            # 1/f-ish amplitude so low frequencies dominate but high
            # frequencies still clear the FAST threshold (~20 levels)
            amp = 260.0 / (1.0 + 0.02 * mag)
        amp = amp / amp.sum() * 420.0
        phase = rng.uniform(0, 2 * np.pi, n_waves)
        return Texture(amp, freq, phase)

    @staticmethod
    def make_fine(seed: int = 0, n_waves: int = 48) -> "Texture":
        """Sharp texture whose detail reaches ~2 px at level 0 for a camera
        2 m above the surface (f=315.5): FAST corners then live on pyramid
        level 0 like the reference's photographed test texture, instead of
        being pushed to coarse levels by a band-limited pattern.  (Measured
        on the surface scene: level hist [586, 14, 0] vs [14, 63, 505] for
        the default texture.)"""
        return Texture.make(seed=seed, n_waves=n_waves, min_freq=30.0,
                            max_freq=500.0, flat_spectrum=True)

    def eval(self, xy: jnp.ndarray) -> jnp.ndarray:
        """xy (..., 2) world coords -> intensity (...)."""
        amp = jnp.asarray(self.amp, dtype=jnp.float32)
        freq = jnp.asarray(self.freq, dtype=jnp.float32)
        phase = jnp.asarray(self.phase, dtype=jnp.float32)
        arg = xy[..., None, 0] * freq[:, 0] + xy[..., None, 1] * freq[:, 1]
        val = jnp.sum(amp * jnp.sin(arg + phase), axis=-1)
        return jnp.clip(127.5 + val, 0.0, 255.0)


def look_down_pose(x: float, y: float, z: float,
                   yaw: float = 0.0, pitch: float = 0.0,
                   roll: float = 0.0) -> SE3:
    """T_w_c for a camera at (x, y, z) looking down the -z world axis
    (optical axis +z_cam maps to -z_world), with small perturbations."""
    # base: camera z -> world -z, camera x -> world x, camera y -> world -y
    R_base = jnp.array([[1.0, 0.0, 0.0],
                        [0.0, -1.0, 0.0],
                        [0.0, 0.0, -1.0]], dtype=jnp.float32)
    pert = SE3.exp(jnp.array([0, 0, 0, roll, pitch, yaw], dtype=jnp.float32))
    R = pert.R @ R_base
    return SE3(R, jnp.array([x, y, z], dtype=jnp.float32))


def circle_trajectory(n_frames: int, radius: float = 0.4,
                      height: float = 1.5, wobble: float = 0.05,
                      revolutions: float = 1.0) -> list[SE3]:
    """Down-looking circular MAV-style sweep (paper's aerial rig)."""
    poses = []
    for i in range(n_frames):
        a = 2 * np.pi * revolutions * i / max(n_frames - 1, 1)
        poses.append(look_down_pose(
            radius * np.cos(a), radius * np.sin(a),
            height + wobble * np.sin(3 * a),
            yaw=0.1 * np.sin(a), pitch=0.03 * np.sin(2 * a),
            roll=0.03 * np.cos(2 * a)))
    return poses


def line_trajectory(n_frames: int, speed: float = 0.02,
                    height: float = 1.5) -> list[SE3]:
    """Straight lateral sweep (good for controlled-disparity tests)."""
    return [look_down_pose(i * speed, 0.0, height) for i in range(n_frames)]


def render_frame(cam: PinholeCamera, tex: Texture, T_w_c: SE3,
                 shape: Tuple[int, int] = (480, 752)):
    """Render (image (H, W) f32 in [0,255], depth (H, W) f32).

    depth is distance along the unit bearing ray (the reference's depth
    convention: Point = f * depth, svo/src/matcher.cpp:160).
    """
    H, W = shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    f = cam.cam2world(grid)                      # (H, W, 3) unit bearings
    d_w = T_w_c.rotate(f)                        # ray directions in world
    cz = T_w_c.t[2]
    dz = d_w[..., 2]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)
    depth = -cz / dz_safe                        # plane z=0 intersection
    depth = jnp.where((dz < -1e-6) & (depth > 0), depth, jnp.inf)
    pw = T_w_c.t[None, None, :] + depth[..., None] * d_w
    img = tex.eval(pw[..., :2])
    img = jnp.where(jnp.isfinite(depth), img, 0.0)
    return img, depth


@dataclasses.dataclass(frozen=True)
class SineSurface:
    """Sinusoidal height field z = amp * sin(kx*x + p0) * sin(ky*y + p1).

    Faithful proxy for the reference's `sin2_tex2_h1_v8_d` Blender scene
    (textured sinusoidal surface under a down-looking camera;
    svo/test/README.md, svo/test/test_utils.h:30-51): depth varies
    per-pixel and per-ray, so warps are genuinely affine and the depth
    filter sees a non-constant field — unlike the flat z=0 plane.

    Slope bound: max |grad h| = amp * k.  Rays converge to a UNIQUE
    surface hit when slope * tan(max half-FOV) < 1; the defaults give
    0.31 * 1.19 = 0.37 for the reference test camera.  Epipolar-match
    accuracy on any such scene is limited by the affine-warp
    approximation (constant-depth patch model, the same one the
    reference uses, svo/src/matcher.cpp:33-55), so the achievable
    error scales with surface slope — measured here: p50 depth error
    0.033 (x100 m) at slope 0, 0.12 at slope 0.31, 0.24 at slope 0.63
    for the reference matcher-test pose pair.
    """
    amp: float = 0.2
    kx: float = 2.0 * np.pi / 4.0      # wavelength 4 m
    ky: float = 2.0 * np.pi / 4.0
    p0: float = 0.37
    p1: float = 1.13

    def height(self, xy: jnp.ndarray) -> jnp.ndarray:
        return self.amp * jnp.sin(self.kx * xy[..., 0] + self.p0) \
            * jnp.sin(self.ky * xy[..., 1] + self.p1)


def render_surface_frame(cam, tex: Texture, surf: SineSurface, T_w_c: SE3,
                         shape: Tuple[int, int] = (480, 752),
                         n_bisect: int = 40):
    """Render (image, depth) of the textured height field.

    Ray-surface intersection by bisection on the ray parameter t of
    g(t) = z(t) - h(x(t), y(t)), bracketed by the planes z = +/-amp.
    g is monotone under the slope bound above, so the root is unique and
    40 bisections reach float32 precision.  depth = t along the UNIT
    bearing ray (reference convention, svo/src/matcher.cpp:160).
    """
    H, W = shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    f = cam.cam2world(grid)                      # (H, W, 3) unit bearings
    d_w = T_w_c.rotate(f)
    c = T_w_c.t
    dz = d_w[..., 2]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-6, -1e-6, dz)
    down = dz < -1e-6
    # bracket: t at z = +amp (above every surface point) .. z = -amp
    t_lo = (surf.amp - c[2]) / dz_safe
    t_hi = (-surf.amp - c[2]) / dz_safe
    t_lo = jnp.maximum(t_lo, 0.0)

    def g(t):
        p = c[None, None, :] + t[..., None] * d_w
        return p[..., 2] - surf.height(p[..., :2])

    lo, hi = t_lo, t_hi
    for _ in range(n_bisect):          # unrolled: tiny fixed trip count
        mid = 0.5 * (lo + hi)
        below = g(mid) < 0.0           # past the surface
        hi = jnp.where(below, mid, hi)
        lo = jnp.where(below, lo, mid)
    depth = 0.5 * (lo + hi)
    depth = jnp.where(down & (depth > 0), depth, jnp.inf)
    pw = c[None, None, :] + depth[..., None] * d_w
    img = tex.eval(pw[..., :2])
    img = jnp.where(jnp.isfinite(depth), img, 0.0)
    return img, depth


class SurfaceDataset:
    """Rendered sequence over the sinusoidal surface with ground truth.

    Mirrors the reference test protocol's scene role: 752x480 frames,
    Pinhole(315.5, 315.5, 376, 240), down-looking camera ~2 m above a
    textured sinusoidal surface, lateral sweep (the test poses in
    svo/test/test_matcher.cpp:52-57 move ~0.45 m in x/y at z = 2)."""

    def __init__(self, n_frames: int = 20, seed: int = 0,
                 shape: Tuple[int, int] = (480, 752),
                 height: float = 2.0, step: float = 0.03,
                 surf: SineSurface | None = None,
                 tex: Texture | None = None):
        self.cam = reference_test_camera(shape[1], shape[0])
        # fine texture: the reference scene is a sharp photographic
        # texture, so corners sit on pyramid level 0 (see make_fine)
        self.tex = tex if tex is not None else Texture.make_fine(seed=seed)
        self.surf = surf if surf is not None else SineSurface()
        self.shape = shape
        # diagonal sweep like the reference matcher-test pose pair, with
        # mild attitude wobble so rotation is exercised too
        self.poses = [
            look_down_pose(0.1131 + step * i, 0.1131 + step * 0.97 * i,
                           height,
                           yaw=0.02 * np.sin(0.4 * i),
                           pitch=0.01 * np.sin(0.3 * i),
                           roll=0.01 * np.cos(0.5 * i))
            for i in range(n_frames)]
        self._render = jax.jit(lambda T: render_surface_frame(
            self.cam, self.tex, self.surf, T, shape))

    def __len__(self):
        return len(self.poses)

    def frame(self, i: int):
        """Returns (img, depth, T_w_c)."""
        img, depth = self._render(self.poses[i])
        return img, depth, self.poses[i]


class SyntheticDataset:
    """Sequence of rendered frames with ground truth, dict-of-arrays style."""

    def __init__(self, n_frames: int = 60, seed: int = 0,
                 trajectory: str = "circle",
                 shape: Tuple[int, int] = (480, 752),
                 tex: Texture | None = None, **traj_kw):
        self.cam = reference_test_camera(shape[1], shape[0])
        self.tex = tex if tex is not None else Texture.make(seed=seed)
        self.shape = shape
        if trajectory == "circle":
            self.poses = circle_trajectory(n_frames, **traj_kw)
        elif trajectory == "line":
            self.poses = line_trajectory(n_frames, **traj_kw)
        else:
            raise ValueError(trajectory)
        self._render = jax.jit(
            lambda T: render_frame(self.cam, self.tex, T, shape))

    def __len__(self):
        return len(self.poses)

    def frame(self, i: int):
        """Returns (img, depth, T_w_c)."""
        img, depth = self._render(self.poses[i])
        return img, depth, self.poses[i]
