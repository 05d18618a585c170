"""TUM trajectory file I/O (the reference's fornt_end.txt / back_end.txt,
``trajectory.cpp:549-559``, ``keyframe_manager.cpp:374-397``)."""

from __future__ import annotations

import numpy as np

from liwslam.core import geometry as geo


def write_tum(path, t_us, T_w, time_offset_s=0.0):
    """T_w: (F,4,4).  Writes '#Time px py pz qx qy qz qw'."""
    import jax.numpy as jnp

    qs = np.asarray(geo.quat_from_mat(jnp.asarray(T_w[:, :3, :3], jnp.float32)))
    with open(path, "w") as f:
        f.write("#Time px py pz qx qy qz qw\n")
        for i in range(len(t_us)):
            t = t_us[i] * 1e-6 + time_offset_s
            x, y, z = T_w[i, :3, 3]
            w, qx, qy, qz = qs[i]
            f.write(
                f"{t:.10f} {x:.10f} {y:.10f} {z:.10f} "
                f"{qx:.10f} {qy:.10f} {qz:.10f} {w:.10f}\n"
            )


def read_tum(path):
    """Returns (t_s (F,), T (F,4,4))."""
    import jax.numpy as jnp

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split()])
    arr = np.asarray(rows)
    t = arr[:, 0]
    p = arr[:, 1:4]
    qxyzw = arr[:, 4:8]
    quat_wxyz = np.concatenate([qxyzw[:, 3:4], qxyzw[:, :3]], axis=1)
    R = np.asarray(geo.mat_from_quat(jnp.asarray(quat_wxyz, jnp.float32)))
    T = np.tile(np.eye(4), (len(arr), 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = p
    return t, T
