"""Output recording — the ``recorder::Config`` consumer.

The reference delegates trajectory/velocity recording and debug-viz dumps to
the external driver task through ``eds::recorder::Config`` (output folder,
poses/velos filenames, viz toggles; src/utils/Config.hpp:27-54). This module
is that recorder: it buffers per-solve poses and 6-dof velocities and writes
them as TUM-format text files, plus optional viz PNG dumps through the
dependency-free ``image_rw`` codec.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from ..config import RecorderConfig
from ..utils.lie import SE3, mat_to_quat
from .image_rw import write_png


class Recorder:
    def __init__(self, cfg: RecorderConfig):
        self.cfg = cfg
        self._poses: List[tuple] = []    # (time, SE3 camToWorld)
        self._velos: List[tuple] = []    # (time, 6-vector)
        os.makedirs(cfg.output_folder, exist_ok=True)

    # ------------------------------------------------------------------
    def record_pose(self, time: float, T_wc: SE3) -> None:
        """Buffer one camToWorld pose (the reference records T_w_ef per
        event solve and keyframe poses per cycle)."""
        self._poses.append((float(time), np.asarray(T_wc.R).copy(),
                            np.asarray(T_wc.t).copy()))

    def record_velocity(self, time: float, vx) -> None:
        """Buffer one 6-dof [linear, angular] velocity sample (the
        tracker's unit-norm velocity state)."""
        self._velos.append((float(time), np.asarray(vx).copy()))

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
        """Write poses/velos files (TUM trajectory format: ``t x y z qx qy
        qz qw``; velos: ``t vx vy vz wx wy wz``). Returns the paths."""
        poses_path = os.path.join(self.cfg.output_folder,
                                  self.cfg.poses_filename)
        with open(poses_path, "w") as f:
            for t, R, tr in self._poses:
                q = np.asarray(mat_to_quat(R))      # [w, x, y, z]
                f.write("%.9f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n"
                        % (t, tr[0], tr[1], tr[2], q[1], q[2], q[3], q[0]))
        velos_path = os.path.join(self.cfg.output_folder,
                                  self.cfg.velos_filename)
        with open(velos_path, "w") as f:
            for t, v in self._velos:
                f.write("%.9f " % t
                        + " ".join("%.6f" % x for x in v) + "\n")
        return poses_path, velos_path
