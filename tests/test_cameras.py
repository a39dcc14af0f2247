import jax
import jax.numpy as jnp
import numpy as np

from rpg_svo_tpu.geometry.cameras import (
    PinholeCamera, ATANCamera, project2d, unproject2d,
)

# The reference test camera: Pinhole(752, 480, 315.5, 315.5, 376, 240)
# (svo/test/test_pipeline.cpp:48)
CAM = PinholeCamera.make(752, 480, 315.5, 315.5, 376.0, 240.0)
CAM_DIST = PinholeCamera.make(752, 480, 315.5, 315.5, 376.0, 240.0,
                              k1=-0.28, k2=0.07, p1=2e-4, p2=2e-5)
ATAN = ATANCamera.make(752, 480, 0.511496, 0.802603, 0.530199, 0.496011,
                       0.934479)  # svo_ros/param/camera_atan.yaml values


def test_pinhole_center_projects_to_principal_point():
    px = CAM.world2cam(jnp.array([0.0, 0.0, 2.0]))
    np.testing.assert_allclose(np.asarray(px), [376.0, 240.0], atol=1e-4)


def test_pinhole_roundtrip_nodist():
    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (256, 2)) * jnp.array([752.0, 480.0])
    f = CAM.cam2world(px)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(f, axis=-1)),
                               np.ones(256), atol=1e-5)
    px2 = CAM.world2cam(f * 3.7)  # scale invariance
    np.testing.assert_allclose(np.asarray(px), np.asarray(px2),
                               rtol=1e-4, atol=1e-3)


def test_pinhole_roundtrip_distorted():
    key = jax.random.PRNGKey(1)
    # stay away from extreme corners where radtan inversion is ill-posed
    px = jax.random.uniform(key, (256, 2)) * jnp.array([600.0, 400.0]) \
        + jnp.array([76.0, 40.0])
    f = CAM_DIST.cam2world(px)
    px2 = CAM_DIST.world2cam(f * 2.0)
    np.testing.assert_allclose(np.asarray(px), np.asarray(px2), atol=1e-2)


def test_atan_roundtrip():
    key = jax.random.PRNGKey(2)
    px = jax.random.uniform(key, (256, 2)) * jnp.array([700.0, 440.0]) \
        + jnp.array([26.0, 20.0])
    f = ATAN.cam2world(px)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(f, axis=-1)),
                               np.ones(256), atol=1e-5)
    px2 = ATAN.world2cam(f * 1.5)
    np.testing.assert_allclose(np.asarray(px), np.asarray(px2), atol=1e-2)


def test_is_in_frame():
    px = jnp.array([[10.0, 10.0], [-1.0, 5.0], [751.0, 479.0],
                    [752.0, 100.0], [375.0, 239.0]])
    m = CAM.is_in_frame(px)
    np.testing.assert_array_equal(np.asarray(m),
                                  [True, False, True, False, True])
    # level-2 coordinates halve the bounds twice
    m2 = CAM.is_in_frame(jnp.array([[187.0, 119.0], [189.0, 119.0]]), level=2)
    np.testing.assert_array_equal(np.asarray(m2), [True, False])


def test_project_unproject2d():
    p = jnp.array([[2.0, -4.0, 4.0]])
    uv = project2d(p)
    np.testing.assert_allclose(np.asarray(uv), [[0.5, -1.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(unproject2d(uv)),
                               [[0.5, -1.0, 1.0]], atol=1e-6)


def test_camera_traces_through_jit():
    @jax.jit
    def go(cam, px):
        return cam.world2cam(cam.cam2world(px) * 2.0)
    px = jnp.array([[100.0, 200.0]])
    out = go(CAM_DIST, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(px), atol=1e-2)
