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


def _make_omni():
    """Synthetic but self-consistent ocam calibration: forward poly
    chosen analytically, inverse poly fit numerically (like the ocam
    toolbox does)."""
    from rpg_svo_tpu.geometry.cameras import OmniCamera
    poly = np.array([-200.0, 0.0, 1e-3, 0.0, 0.0])
    rho = np.linspace(1e-3, 420.0, 2000)
    z_m = poly[0] + poly[2] * rho ** 2
    theta = np.arctan2(z_m, rho)
    inv = np.polynomial.polynomial.polyfit(theta, rho, 9)
    return OmniCamera.make(752, 480, poly, inv, 376.0, 240.0,
                           c=1.0, d=0.0, e=0.0), poly


def test_omni_center_ray_and_roundtrip():
    cam, poly = _make_omni()
    # principal point back-projects to the optical axis (z forward)
    f0 = np.asarray(cam.cam2world(jnp.array([376.0, 240.0])))
    np.testing.assert_allclose(f0, [0.0, 0.0, 1.0], atol=1e-6)
    # and the axis projects back to the center
    px0 = np.asarray(cam.world2cam(jnp.array([0.0, 0.0, 3.0])))
    np.testing.assert_allclose(px0, [376.0, 240.0], atol=0.05)
    # round trip over the image (keep a boundary so rho stays in the
    # fitted range)
    ys, xs = np.mgrid[20:460:40, 20:732:60]
    px = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    f = cam.cam2world(px)
    assert float(jnp.min(f[:, 2])) > 0.0          # all forward
    back = np.asarray(cam.world2cam(f * 2.5))
    err = np.abs(back - np.asarray(px)).max()
    assert err < 0.1, f"roundtrip error {err} px"   # invpoly fit error
    # fx equivalent must match the EMPIRICAL px-per-unit-plane scale at
    # the optical axis (finite difference of world2cam), not the raw
    # first-order inv_poly coefficient (~2.5x off on this calibration)
    eps = 1e-4
    p0 = np.asarray(cam.world2cam(jnp.array([0.0, 0.0, 1.0])))
    p1 = np.asarray(cam.world2cam(jnp.array([eps, 0.0, 1.0])))
    fx_emp = abs(p1[0] - p0[0]) / eps
    assert abs(float(cam.fx) - fx_emp) < 0.05 * fx_emp, \
        (float(cam.fx), fx_emp)


def test_omni_affine_stretch_and_jit():
    from rpg_svo_tpu.geometry.cameras import OmniCamera
    cam, _ = _make_omni()
    skew = OmniCamera.make(752, 480, np.asarray(cam.poly),
                           np.asarray(cam.inv_poly), 376.0, 240.0,
                           c=1.02, d=0.003, e=-0.002)

    @jax.jit
    def rt(c, px):
        return c.world2cam(c.cam2world(px) * 4.0)
    px = jnp.array([[300.0, 150.0], [500.0, 400.0]])
    np.testing.assert_allclose(np.asarray(rt(skew, px)), np.asarray(px),
                               atol=0.1)


def test_omni_yaml_and_ocam_calib_loader(tmp_path):
    cam, poly = _make_omni()
    inv = np.asarray(cam.inv_poly)[:10]
    calib = tmp_path / "calib_results.txt"
    calib.write_text(
        "#polynomial coefficients for the DIRECT mapping function\n\n"
        "5 " + " ".join(f"{v:e}" for v in poly) + "\n\n"
        "#polynomial coefficients for the inverse mapping function\n\n"
        "10 " + " ".join(f"{v:e}" for v in inv) + "\n\n"
        "#center: \"row\" and \"column\", starting from 0 (C convention)\n\n"
        "240.0 376.0\n\n"
        "#affine parameters \"c\", \"d\", \"e\"\n\n"
        "1.0 0.0 0.0\n\n"
        "#image size: \"height\" and \"width\"\n\n"
        "480 752\n")
    yml = tmp_path / "camera_ocam.yaml"
    yml.write_text("cam_model: Ocam\ncam_calib_file: calib_results.txt\n")
    from rpg_svo_tpu.io.camera_loader import load_camera_yaml
    loaded = load_camera_yaml(str(yml))
    assert float(loaded.width) == 752 and float(loaded.height) == 480
    px = jnp.array([[200.0, 300.0]])
    np.testing.assert_allclose(np.asarray(loaded.cam2world(px)),
                               np.asarray(cam.cam2world(px)), atol=1e-5)


def test_pinhole_ideal_dispatch():
    """Zero-distortion construction must select the ideal fast path
    (the 10-pass undistort compiles away); any nonzero coefficient must
    keep the full model.  The two must agree where distortion is zero."""
    from rpg_svo_tpu.geometry.cameras import PinholeCameraIdeal
    c0 = PinholeCamera.make(752, 480, 315.5, 315.5, 376, 240)
    assert isinstance(c0, PinholeCameraIdeal)
    cd = PinholeCamera.make(752, 480, 315.5, 315.5, 376, 240, k1=-0.28)
    assert type(cd) is PinholeCamera
    # full-model math with zero coeffs == ideal math
    cfull = PinholeCamera(*c0)          # same fields, base class
    px = jnp.array([[100.0, 50.0], [700.0, 470.0]])
    np.testing.assert_allclose(np.asarray(c0.cam2world(px)),
                               np.asarray(cfull.cam2world(px)), atol=1e-6)
