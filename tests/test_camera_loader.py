"""Camera YAML loader (vikit camera_loader parity)."""

import numpy as np

from rpg_svo_tpu.io.camera_loader import load_camera_yaml


PINHOLE_YAML = """\
cam_model: Pinhole
cam_width: 752
cam_height: 480
cam_fx: 414.536145
cam_fy: 414.284429
cam_cx: 348.804988
cam_cy: 240.076451
cam_d0: -0.283076
cam_d1: 0.066674
cam_d2: 0.000896
cam_d3: 0.000778
"""

ATAN_YAML = """\
cam_model: ATAN
cam_width: 752
cam_height: 480
cam_fx: 0.509326
cam_fy: 0.796651
cam_cx: 0.45905
cam_cy: 0.510056
cam_d0: 0.9320
"""


def test_load_pinhole(tmp_path):
    p = tmp_path / "camera_pinhole.yaml"
    p.write_text(PINHOLE_YAML)
    cam = load_camera_yaml(str(p))
    assert cam.width == 752 and cam.height == 480
    assert np.isclose(float(cam.fx), 414.536145)
    assert np.isclose(float(cam.cy), 240.076451)
    # distortion round-trip: project a bearing and invert it
    import jax.numpy as jnp
    f = cam.cam2world(jnp.array([[400.0, 250.0]]))
    px = cam.world2cam(f)
    np.testing.assert_allclose(np.asarray(px), [[400.0, 250.0]],
                               atol=0.1)


def test_load_atan(tmp_path):
    p = tmp_path / "camera_atan.yaml"
    p.write_text(ATAN_YAML)
    cam = load_camera_yaml(str(p))
    assert cam.width == 752 and cam.height == 480
    # PTAM normalized convention
    assert np.isclose(float(cam.fx), 0.509326 * 752)
    assert np.isclose(float(cam.cx), 0.45905 * 752 - 0.5)
    import jax.numpy as jnp
    f = cam.cam2world(jnp.array([[376.0, 240.0], [500.0, 300.0]]))
    px = cam.world2cam(f)
    np.testing.assert_allclose(np.asarray(px),
                               [[376.0, 240.0], [500.0, 300.0]],
                               atol=0.2)
