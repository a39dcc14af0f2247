"""I/O + analysis layer tests: native loader, dataset readers (round-trip
through written fixtures), TUM trajectory, trace schema, ATE/RPE."""

import os

import numpy as np
import pytest

from rpg_svo_tpu.io.trajectory import write_tum, read_tum, tum_to_se3
from rpg_svo_tpu.io.trace import TraceWriter, TIMERS, LOGS
from rpg_svo_tpu.io.datasets import (
    load_image_gray, TUMDataset, EuRoCDataset, PrefetchingSource,
)
from rpg_svo_tpu.analysis.ate import associate, align_umeyama, ate_rmse
from rpg_svo_tpu.analysis.rpe import rpe


def _write_png(path, arr):
    from PIL import Image
    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


def test_native_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    _write_png(p, arr)
    img = load_image_gray(p)
    assert img.shape == (48, 64)
    np.testing.assert_allclose(img, arr.astype(np.float32), atol=0.5)


def test_native_loader_builds():
    from rpg_svo_tpu.native import loader as nl
    lib = nl._get_lib()
    assert lib is not None, "native loader failed to build"


def test_pgm_loader(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    p = str(tmp_path / "img.pgm")
    with open(p, "wb") as f:
        f.write(b"P5 40 32 255\n")
        f.write(arr.tobytes())
    from rpg_svo_tpu.native import loader as nl
    img = nl.load_gray(p)
    if img is None:
        pytest.skip("native loader unavailable")
    np.testing.assert_allclose(img, arr.astype(np.float32))


def test_tum_trajectory_roundtrip(tmp_path):
    import jax.numpy as jnp
    from rpg_svo_tpu.geometry.se3 import SE3, rot_to_quat
    p = str(tmp_path / "traj.txt")
    T = SE3.exp(jnp.array([[0.1, 0.2, 0.3, 0.05, 0.1, -0.02],
                           [0.4, -0.1, 0.0, 0.0, 0.2, 0.1]]))
    entries = [(0.1, np.asarray(T.t[i]), np.asarray(rot_to_quat(T.R[i])))
               for i in range(2)]
    entries = [(0.1 * (i + 1), e[1], e[2]) for i, e in enumerate(entries)]
    write_tum(p, entries)
    ts, t, q = read_tum(p)
    assert ts.shape == (2,)
    np.testing.assert_allclose(t, np.asarray(T.t), atol=1e-5)
    T2 = tum_to_se3(t, q)
    np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R),
                               atol=1e-4)


def test_trace_writer_schema(tmp_path):
    tw = TraceWriter(str(tmp_path), "test")
    tw.log_frame({"timestamp": 0.1, "proc_time": 0.002,
                  "img_align_n_tracked": 100, "repr_n_mps": 200,
                  "repr_n_new_references": 150, "result": "no_keyframe"})
    path = tw.flush()
    with open(path) as f:
        header = f.readline().strip().split(",")
    assert header == TIMERS + LOGS


def test_timing_plots(tmp_path):
    """analyse_timing.py parity: the plot suite renders from a trace CSV
    (ref svo_analysis/src/svo_analysis/analyse_timing.py:16-69)."""
    from rpg_svo_tpu.analysis.timing import load_trace, plot_timing

    tw = TraceWriter(str(tmp_path), "plots")
    rng = np.random.default_rng(0)
    for i in range(30):
        tw.log_frame({"timestamp": 0.02 * i,
                      "proc_time": 0.004 + 0.001 * rng.random(),
                      "sparse_img_align": 0.001, "reproject": 0.0015,
                      "pyramid_creation": 0.0004,
                      "pose_optimizer": 0.0005, "point_optimizer": 0.0002,
                      "feature_align": 0.001, "reproject_kfs": 0.0003,
                      "reproject_candidates": 0.0002,
                      "repr_n_mps": 100, "result": "no_keyframe"})
    path = tw.flush()
    written = plot_timing(load_trace(path), str(tmp_path))
    assert len(written) == 3
    for p in written:
        assert os.path.exists(p) and os.path.getsize(p) > 500


def test_dashboard_renders(tmp_path):
    """rqt_svo widget parity: dashboard PNG from a trace CSV."""
    from rpg_svo_tpu.analysis.timing import load_trace
    from rpg_svo_tpu.tools.dashboard import render_dashboard

    tw = TraceWriter(str(tmp_path), "dash")
    for i in range(20):
        tw.log_frame({"timestamp": 0.02 * i, "proc_time": 0.004,
                      "repr_n_new_references": 80 + i,
                      "repr_n_mps": 100,
                      "result": "failure" if i == 7 else "no_keyframe"})
    path = tw.flush()
    out = render_dashboard(load_trace(path), str(tmp_path / "dash.png"))
    assert os.path.getsize(out) > 5000


def test_tum_dataset_reader(tmp_path):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    imgs = []
    with open(root / "rgb.txt", "w") as f:
        f.write("# comment\n")
        for i in range(3):
            rel = f"rgb/{i}.png"
            arr = np.full((24, 32), i * 10, np.uint8)
            _write_png(str(root / rel), arr)
            f.write(f"{i * 0.1:.4f} {rel}\n")
    with open(root / "groundtruth.txt", "w") as f:
        for i in range(3):
            f.write(f"{i * 0.1:.4f} {i} 0 0 0 0 0 1\n")
    ds = TUMDataset(str(root))
    assert len(ds) == 3
    img, ts = ds.frame(1)
    assert img.shape == (24, 32)
    assert abs(ts - 0.1) < 1e-9
    assert ds.gt is not None


def test_euroc_dataset_reader(tmp_path):
    root = tmp_path / "euroc"
    cam = root / "mav0" / "cam0" / "data"
    cam.mkdir(parents=True)
    with open(root / "mav0" / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(2):
            name = f"{i}.png"
            _write_png(str(cam / name), np.zeros((16, 16), np.uint8))
            f.write(f"{int(i * 5e7)},{name}\n")
    ds = EuRoCDataset(str(root))
    assert len(ds) == 2
    img, ts = ds.frame(1)
    assert img.shape == (16, 16)
    assert abs(ts - 0.05) < 1e-9


def test_prefetching_source(tmp_path):
    root = tmp_path / "tum2"
    (root / "rgb").mkdir(parents=True)
    with open(root / "rgb.txt", "w") as f:
        for i in range(5):
            rel = f"rgb/{i}.png"
            _write_png(str(root / rel), np.full((8, 8), i, np.uint8))
            f.write(f"{i * 0.1:.4f} {rel}\n")
    ds = TUMDataset(str(root))
    got = [(i, f[0][0, 0]) for i, f in PrefetchingSource(ds, 2)]
    assert [g[0] for g in got] == [0, 1, 2, 3, 4]
    assert [g[1] for g in got] == [0, 1, 2, 3, 4]


def test_associate():
    a = np.array([0.0, 0.1, 0.2, 0.35])
    b = np.array([0.005, 0.11, 0.31])
    ia, ib = associate(a, b, max_dt=0.02)
    assert list(ia) == [0, 1]
    assert list(ib) == [0, 1]


def test_umeyama_alignment_exact():
    rng = np.random.default_rng(0)
    model = rng.normal(size=(50, 3))
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    data = s * model @ R.T + t
    s2, R2, t2 = align_umeyama(model, data)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    res = ate_rmse(data, model)
    assert res["rmse"] < 1e-6
    assert abs(res["scale"] - s) < 1e-6


def test_rpe_identity_is_zero():
    n = 10
    t = np.cumsum(np.ones((n, 3)) * 0.1, axis=0)
    R = np.tile(np.eye(3), (n, 1, 1))
    res = rpe(t, R, t, R, delta=2)
    assert res["trans_rmse"] < 1e-9
    assert res["rot_rmse"] < 1e-9


def test_rpe_detects_drift():
    n = 10
    t = np.cumsum(np.ones((n, 3)) * 0.1, axis=0)
    R = np.tile(np.eye(3), (n, 1, 1))
    t2 = t * 1.1   # 10% scale drift
    res = rpe(t, R, t2, R, delta=1)
    assert res["trans_rmse"] > 0.01


def test_edgelet_overlay_and_markers(tmp_path):
    """Visualizer parity extras: edgelet gradient-line overlay
    (visualizer.cpp:137-144), init track lines (:117-127) and the data
    marker set + its offline plot consumer (:198-267)."""
    import numpy as np
    import jax.numpy as jnp
    from rpg_svo_tpu import viz
    from rpg_svo_tpu.geometry.se3 import SE3
    from rpg_svo_tpu.core.map import init_map, TYPE_DELETED, TYPE_GOOD

    img = np.zeros((48, 64), np.float32)
    px = np.array([[32.0, 24.0], [10.0, 10.0]])
    valid = np.array([True, True])
    ftype = np.array([1, 0])                  # edgelet + corner
    grad = np.array([[1.0, 0.0], [1.0, 0.0]])
    out = viz.draw_features(img, px, valid, feat_type=ftype, grad=grad)
    # edgelet: vertical segment through (32, 24) (dir = (grad_y, -grad_x))
    assert out[21, 32] == 255.0 and out[27, 32] == 255.0
    assert out[24, 29] == 0.0                 # not a square
    # corner: square outline at (10, 10)
    assert out[8, 10] == 255.0 and out[12, 10] == 255.0

    tracks = viz.draw_init_tracks(img, np.array([[5.0, 5.0]]),
                                  np.array([[15.0, 5.0]]),
                                  np.array([True]))
    assert tracks[5, 5:16].min() == 255.0

    m = init_map(n_kfs=4, n_feats=8, n_points=16, n_obs=4, n_seeds=16,
                 pyr_shape=(1, 64))
    m = m._replace(kf=m.kf._replace(
        active=m.kf.active.at[0].set(True),
        frame_id=m.kf.frame_id.at[0].set(7)))
    pt = m.pt._replace(
        ptype=m.pt.ptype.at[0].set(TYPE_GOOD).at[1].set(TYPE_DELETED),
        pos=m.pt.pos.at[0].set(jnp.array([1.0, 2.0, 3.0])),
        orig_kf=m.pt.orig_kf.at[1].set(0))
    m = m._replace(pt=pt)
    mk = viz.markers_from_map(m, SE3.identity(), trace_id=3)
    assert mk.trajectory_id == 3
    assert list(mk.kf_ids) == [7]
    assert 0 in mk.point_ids and 1 not in mk.point_ids
    assert 1 in mk.deleted_ids             # deleted point marker removal
    np.testing.assert_allclose(mk.point_pos[0], [1.0, 2.0, 3.0])

    from rpg_svo_tpu.analysis.compare import plot_markers
    pdf = str(tmp_path / "map.pdf")
    plot_markers([mk, mk], pdf)
    import os
    assert os.path.getsize(pdf) > 0


def test_native_prefetch_queue(tmp_path):
    """C++ worker-pool prefetch (loader.cpp svo_prefetch_*): decode on
    native threads with a bounded in-flight window, frames returned in
    order through NativePrefetchingSource."""
    from rpg_svo_tpu.native.loader import _get_lib, NativePrefetcher
    if _get_lib() is None:
        import pytest
        pytest.skip("native loader not built")
    root = tmp_path / "tum3"
    (root / "rgb").mkdir(parents=True)
    with open(root / "rgb.txt", "w") as f:
        for i in range(10):
            rel = f"rgb/{i}.png"
            _write_png(str(root / rel), np.full((12, 16), i, np.uint8))
            f.write(f"{i * 0.1:.4f} {rel}\n")
    ds = TUMDataset(str(root))
    assert ds.image_path(3).endswith("rgb/3.png")
    from rpg_svo_tpu.io.datasets import NativePrefetchingSource
    src = NativePrefetchingSource(ds, n_workers=3, n_ahead=4)
    got = [(i, float(img[0, 0]), ts) for i, (img, ts) in src]
    assert [g[0] for g in got] == list(range(10))
    assert [g[1] for g in got] == [float(i) for i in range(10)]
    assert abs(got[7][2] - 0.7) < 1e-9

    # direct queue API: out-of-order get
    with NativePrefetcher(n_workers=2, queue_cap=4) as pf:
        assert pf.submit(100, str(root / "rgb/5.png"))
        assert pf.submit(101, str(root / "rgb/2.png"))
        img = pf.get(101)
        assert img.shape == (12, 16) and img[0, 0] == 2.0
        assert pf.get(100)[0, 0] == 5.0
