"""Generate the committed tiny-KITTI fixture drive (run once; output is
checked in so tests never depend on this script).

The fixture mirrors the raw-KITTI layout the reference consumes
(``pipeline/camera/kitti_single_view_camera.py:17-23``, drive discovery
``helpers/imageio_helpers.py:32-43``)::

    kitti/2011_09_26/
      calib_cam_to_cam.txt
      calib_velo_to_cam.txt
      2011_09_26_drive_0001_sync/
        image_02/data/0000000000.png  0000000001.png   (375x1242 RGB)
        image_03/data/...
        velodyne_points/data/0000000000.bin ...         (N x 4 float32)

The calibration is chosen so every projection is hand-computable (the
expected values are embedded as literals in ``tests/test_kitti_camera.py``):

* ``Tr_velo_to_cam``: axis permutation cam = (-y, -z, x) plus a 0.27 m
  forward translation — so the camera-frame depth (``x + 0.27``) differs
  from the Velodyne forward distance (``x``), which is what
  ``vel_depth=True`` selects (the reference always evaluates with it,
  ``kitti_single_view_camera.py:61``).
* ``R_rect_00 = I``; ``P_rect_02 = [[100,0,621,6],[0,100,187,0],[0,0,1,0]]``
  and ``P_rect_03`` with ``[0,3] = -48`` — giving focal = 100 px,
  b2 = -0.06 m, b3 = 0.48 m, baseline = 0.54 m (same derivation as the
  reference's ``get_focal_length_baseline``).

Per frame, five Velodyne points (forward, left, up, reflectance):

    (19.73,  0.00, 0.00)  -> pixel (row 186, col 620), distance 19.73
    ( 9.73,  0.03, 0.00)  -> SAME pixel, distance 9.73  (min-depth dedup)
    (24.73, -2.50, 1.25)  -> pixel (row 181, col 630), distance 24.73
    (-5.00,  1.00, 0.00)  -> behind the image plane, dropped
    (19.73, -130.0, 0.00) -> projects right of the image, dropped
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CALIB_DIR = os.path.join(HERE, "kitti", "2011_09_26")
DRIVE_DIR = os.path.join(CALIB_DIR, "2011_09_26_drive_0001_sync")

CAM_TO_CAM = """\
calib_time: 01-Jan-2026 00:00:00
corner_dist: 9.950000e-02
R_rect_00: 1 0 0 0 1 0 0 0 1
P_rect_02: 100 0 621 6 0 100 187 0 0 0 1 0
P_rect_03: 100 0 621 -48 0 100 187 0 0 0 1 0
"""

VELO_TO_CAM = """\
calib_time: 01-Jan-2026 00:00:00
R: 0 -1 0 0 0 -1 1 0 0
T: 0 0 0.27
"""

VELODYNE_POINTS = np.array([
    [19.73, 0.00, 0.00, 0.5],
    [9.73, 0.03, 0.00, 0.5],
    [24.73, -2.50, 1.25, 0.5],
    [-5.00, 1.00, 0.00, 0.5],
    [19.73, -130.0, 0.00, 0.5],
], dtype=np.float32)


def make_frame(seed: int) -> np.ndarray:
    """A 375x1242 RGB uint8 left view: smooth gratings (compress well as
    PNG) with enough texture for the matchers to lock onto."""
    h, w = 375, 1242
    x = np.arange(h, dtype=np.float32)[:, None]
    y = np.arange(w, dtype=np.float32)[None, :]
    rng = np.random.default_rng(seed)
    img = np.full((3, h, w), 128.0, np.float32)
    for c in range(3):
        for _ in range(4):
            fx, fy = rng.uniform(0.01, 0.2, 2)
            phase = rng.uniform(0, 2 * np.pi)
            img[c] += 24.0 * np.sin(fx * x + fy * y + phase)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def write_png(path: str, chw: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.transpose(chw, (1, 2, 0))).save(path, optimize=True)


def main() -> None:
    for sub in ("image_02/data", "image_03/data", "velodyne_points/data"):
        os.makedirs(os.path.join(DRIVE_DIR, sub), exist_ok=True)
    with open(os.path.join(CALIB_DIR, "calib_cam_to_cam.txt"), "w") as f:
        f.write(CAM_TO_CAM)
    with open(os.path.join(CALIB_DIR, "calib_velo_to_cam.txt"), "w") as f:
        f.write(VELO_TO_CAM)
    for i in range(2):
        left = make_frame(seed=7 + i)
        right = np.roll(left, -5, axis=-1)  # a ~5 px everywhere-disparity pair
        write_png(os.path.join(DRIVE_DIR, "image_02", "data",
                               f"{i:010d}.png"), left)
        write_png(os.path.join(DRIVE_DIR, "image_03", "data",
                               f"{i:010d}.png"), right)
        VELODYNE_POINTS.tofile(os.path.join(DRIVE_DIR, "velodyne_points",
                                            "data", f"{i:010d}.bin"))
    print(f"Wrote fixture drive to {DRIVE_DIR}")


if __name__ == "__main__":
    main()
