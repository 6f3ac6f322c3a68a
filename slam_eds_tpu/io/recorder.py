"""Output recording — the ``recorder::Config`` consumer.

The reference delegates trajectory/velocity recording and debug-viz dumps to
the external driver task through ``eds::recorder::Config`` (output folder,
poses/velos filenames, viz toggles; src/utils/Config.hpp:27-54). This module
is that recorder: per-solve poses and 6-dof velocities are appended to
TUM-format text files as they arrive (line-buffered, so a crash mid-sequence
loses at most the current line), plus optional viz PNG dumps through the
dependency-free ``image_rw`` codec.
"""
from __future__ import annotations

import os

import numpy as np

from ..config import RecorderConfig
from ..utils.lie import SE3, mat_to_quat
from .image_rw import write_png


class Recorder:
    def __init__(self, cfg: RecorderConfig):
        self.cfg = cfg
        os.makedirs(cfg.output_folder, exist_ok=True)
        self.poses_path = os.path.join(cfg.output_folder, cfg.poses_filename)
        self.velos_path = os.path.join(cfg.output_folder, cfg.velos_filename)
        self._poses_f = open(self.poses_path, "w", buffering=1)
        self._velos_f = open(self.velos_path, "w", buffering=1)
        self.n_poses = 0
        self.n_velos = 0

    # ------------------------------------------------------------------
    def record_pose(self, time: float, T_wc: SE3) -> None:
        """Append one camToWorld pose (TUM format: ``t x y z qx qy qz qw``;
        the reference records T_w_ef per event solve)."""
        tr = np.asarray(T_wc.t)
        q = np.asarray(mat_to_quat(np.asarray(T_wc.R)))      # [w, x, y, z]
        self._poses_f.write(
            "%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n"
            % (float(time), tr[0], tr[1], tr[2], q[1], q[2], q[3], q[0]))
        self.n_poses += 1

    def record_velocity(self, time: float, vx) -> None:
        """Append one 6-dof [linear, angular] velocity sample (the tracker's
        unit-norm velocity state): ``t vx vy vz wx wy wz``."""
        v = np.asarray(vx)
        self._velos_f.write("%.9f " % float(time)
                            + " ".join("%.6f" % x for x in v) + "\n")
        self.n_velos += 1

    def save_viz(self, name: str, img) -> str:
        """Dump a float image in [0,1] (or uint8) as PNG into the output
        folder (the reference writes debug images to /tmp,
        KeyFrame.cpp:917-918)."""
        a = np.asarray(img)
        if a.dtype != np.uint8:
            a = np.clip(np.nan_to_num(a) * 255.0, 0, 255).astype(np.uint8)
        path = os.path.join(self.cfg.output_folder, name + ".png")
        write_png(path, a)
        return path

    # ------------------------------------------------------------------
    def flush(self) -> tuple:
        """Flush both files to disk; returns their paths. Records are
        already written line-by-line — this just syncs buffers."""
        self._poses_f.flush()
        self._velos_f.flush()
        return self.poses_path, self.velos_path

    def close(self) -> None:
        self._poses_f.close()
        self._velos_f.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
