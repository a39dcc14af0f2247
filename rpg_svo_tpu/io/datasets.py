"""Dataset readers: Blender/sin2 format, TUM RGB-D, EuRoC MAV.

Equivalent of the reference's dataset plumbing:
- BenchmarkNode's images.txt / trajectory.txt parsing + vikit
  blender_utils depth maps (svo_ros/src/benchmark_node.cpp:133-256);
- the TUM and EuRoC layouts used by BASELINE.json's configs.

Image decoding goes through the native C++ loader
(rpg_svo_tpu/native/loader.cpp: libpng decode + pthread prefetch queue)
when built, with a PIL fallback — mirroring the reference's use of native
OpenCV imread + a producer/consumer frame queue.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from rpg_svo_tpu.geometry.se3 import SE3
from rpg_svo_tpu.io.trajectory import tum_to_se3


def load_image_gray(path: str) -> np.ndarray:
    """Grayscale f32 image in [0, 255]; native loader if available."""
    from rpg_svo_tpu.native import loader as nl
    img = nl.load_gray(path)
    if img is not None:
        return img
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), dtype=np.float32)


class BlenderDataset:
    """The reference test-dataset layout (sin2_tex2_h1_v8_d):
    <dir>/trajectory.txt lines: `img_name tx ty tz qx qy qz qw`
    (vikit FileType::ImageNameAndPose), images under <dir>/img/,
    float32 depth maps under <dir>/depth/<img>.depth (one float per px,
    depth along the bearing ray)."""

    def __init__(self, root: str):
        self.root = root
        self.entries: List[Tuple[str, np.ndarray, np.ndarray]] = []
        with open(os.path.join(root, "trajectory.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                v = line.split()
                name = v[0]
                vals = [float(x) for x in v[1:9]]
                self.entries.append((name, np.asarray(vals[:3]),
                                     np.asarray(vals[3:7])))

    def __len__(self):
        return len(self.entries)

    def frame(self, i: int):
        """Returns (img f32 (H, W), T_w_c: SE3, name)."""
        name, t, q = self.entries[i]
        img = load_image_gray(os.path.join(self.root, "img",
                                           name + "_0.png"))
        T = tum_to_se3(t[None], q[None])
        return img, SE3(T.R[0], T.t[0]), name

    def depth(self, i: int, shape: Tuple[int, int]) -> Optional[np.ndarray]:
        name = self.entries[i][0]
        p = os.path.join(self.root, "depth", name + "_0.depth")
        if not os.path.exists(p):
            return None
        vals = np.fromstring(open(p).read(), sep=" ", dtype=np.float32) \
            if hasattr(np, "fromstring") else None
        if vals is None or vals.size != shape[0] * shape[1]:
            vals = np.loadtxt(p).astype(np.float32).ravel()
        return vals.reshape(shape)


class TUMDataset:
    """TUM RGB-D monocular: <dir>/rgb.txt (timestamp path),
    <dir>/groundtruth.txt (timestamp tx ty tz qx qy qz qw)."""

    def __init__(self, root: str):
        self.root = root
        self.frames: List[Tuple[float, str]] = []
        with open(os.path.join(root, "rgb.txt")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, rel = line.split()[:2]
                self.frames.append((float(ts), rel))
        gt_path = os.path.join(root, "groundtruth.txt")
        self.gt = None
        if os.path.exists(gt_path):
            from rpg_svo_tpu.io.trajectory import read_tum
            self.gt = read_tum(gt_path)

    def __len__(self):
        return len(self.frames)

    def frame(self, i: int):
        ts, rel = self.frames[i]
        img = load_image_gray(os.path.join(self.root, rel))
        return img, ts

    def image_path(self, i: int) -> str:
        return os.path.join(self.root, self.frames[i][1])

    def timestamp(self, i: int) -> float:
        return self.frames[i][0]


class EuRoCDataset:
    """EuRoC MAV: <dir>/mav0/cam0/data.csv (+ data/*.png) and
    <dir>/mav0/state_groundtruth_estimate0/data.csv."""

    def __init__(self, root: str, cam: str = "cam0"):
        self.root = root
        base = os.path.join(root, "mav0", cam)
        self.img_dir = os.path.join(base, "data")
        self.frames: List[Tuple[float, str]] = []
        with open(os.path.join(base, "data.csv")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts_ns, name = line.split(",")[:2]
                self.frames.append((int(ts_ns) * 1e-9, name.strip()))
        self.gt = None
        gt_csv = os.path.join(root, "mav0",
                              "state_groundtruth_estimate0", "data.csv")
        if os.path.exists(gt_csv):
            rows = np.loadtxt(gt_csv, delimiter=",", skiprows=1)
            ts = rows[:, 0] * 1e-9
            t = rows[:, 1:4]
            # EuRoC quaternion order: qw qx qy qz -> convert to xyzw
            q = rows[:, [5, 6, 7, 4]]
            self.gt = (ts, t, q)

    def __len__(self):
        return len(self.frames)

    def frame(self, i: int):
        ts, name = self.frames[i]
        img = load_image_gray(os.path.join(self.img_dir, name))
        return img, ts

    def image_path(self, i: int) -> str:
        return os.path.join(self.img_dir, self.frames[i][1])

    def timestamp(self, i: int) -> float:
        return self.frames[i][0]


class PrefetchingSource:
    """Background-thread image prefetcher over any dataset with .frame(i).

    Equivalent role to the reference's frame queue between the camera
    callback and the pipeline (depth_filter.cpp:82-97): keeps the device
    fed while the host decodes the next images.
    """

    def __init__(self, dataset, n_ahead: int = 4):
        import queue
        import threading
        self.ds = dataset
        self.q = queue.Queue(maxsize=n_ahead)
        self._stop = False

        def worker():
            for i in range(len(dataset)):
                if self._stop:
                    break
                self.q.put((i, dataset.frame(i)))
            self.q.put(None)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item

    def close(self):
        self._stop = True


class NativePrefetchingSource:
    """File-dataset prefetcher on the C++ worker pool (loader.cpp
    svo_prefetch_*): decode threads are native (no GIL), the bounded
    in-flight window is enforced in C++, and frames come back in order.

    Works for datasets whose frames are image FILES (exposes
    .image_path(i) + .timestamp(i)); falls back to PrefetchingSource
    when the native library is unavailable."""

    def __init__(self, dataset, n_workers: int = 2, n_ahead: int = 6):
        from rpg_svo_tpu.native.loader import NativePrefetcher
        self.ds = dataset
        self.pf = NativePrefetcher(n_workers=n_workers, queue_cap=n_ahead)
        self._submitted = 0

    def _pump(self):
        while self._submitted < len(self.ds):
            if not self.pf.submit(self._submitted,
                                  self.ds.image_path(self._submitted)):
                break
            self._submitted += 1

    def __iter__(self):
        try:
            self._pump()
            for i in range(len(self.ds)):
                img = self.pf.get(i)
                self._pump()
                yield i, (img, self.ds.timestamp(i))
        finally:
            self.close()

    def close(self):
        if self.pf is not None:
            self.pf.close()
            self.pf = None
