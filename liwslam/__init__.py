"""liwslam — a TPU-native 2D LiDAR-Inertial-Wheel SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
2DLIW-SLAM (reference: LittleDang/2DLIW-SLAM, a ROS1/C++/Ceres system):

- IMU + wheel-odometry preintegration        -> ``liwslam.frontend.preintegration``
- laser line/corner extraction + matching    -> ``liwslam.frontend.scan`` / ``.matching``
- tightly-coupled sliding-window solve with
  marginalization prior                      -> ``liwslam.solve``
- corner-constellation loop detection        -> ``liwslam.backend.loop``
- pose-graph back end                        -> ``liwslam.backend.posegraph``
- distributed (multi-chip/host) pose graph   -> ``liwslam.parallel``
- dormant monocular camera capability        -> ``liwslam.camera``

Design stance (NOT a port): state lives in fixed-capacity masked arrays,
factors are batched residual functions differentiated with ``jax.jacfwd``,
both Ceres problems of the reference collapse into one masked
Gauss-Newton/LM loop, and the whole per-frame front end compiles into a
single XLA program that ``lax.scan``s over frames.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM is a numerics problem: Gauss-Newton normal equations, Lie-group
# compositions and eigendecompositions need true float32 accumulation.  TPU
# matmuls default to bfloat16 inputs, which injects ~1e-2 errors into 3x3
# rotation algebra — unacceptable here.  Hot kernels that can tolerate bf16
# (dense match scoring, descriptor popcounts) opt back in locally.
_jax.config.update("jax_default_matmul_precision", "highest")

# The TPU tunnel in this environment compiles remotely (~30 s+ per program);
# persist compiled executables across processes so repeat runs skip it.
# The cache is keyed per requested platform: a CPU executable AOT-compiled
# by the remote service targets different machine features than this host
# (cpu_aot_loader warns of possible SIGILL if shared).
import os as _os

# honor an in-process override (tests force cpu via jax.config before
# importing liwslam) over the environment variable.  Cache dirs are keyed
# by platform: axon runs remote-compile some CPU-host programs whose AOT
# machine features differ from this host (SIGILL risk if a cpu run were
# to load them), so the two populations must never share a directory.
_platform = (
    getattr(_jax.config, "jax_platforms", None)
    or _os.environ.get("JAX_PLATFORMS", "default")
).replace(",", "_")
_cache = _os.environ.get(
    "LIWSLAM_JAX_CACHE", f"/tmp/liwslam_jax_cache_{_platform}"
)
try:
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass

from liwslam.config import Params  # noqa: F401,E402
