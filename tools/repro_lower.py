"""Repro: Mosaic lowering of the track_solve kernel (no TPU execution)."""

import sys

sys.path.insert(0, ".")
import jax

from liwslam.ops import track_solve
from tests import test_track_solve as tt
from tests.test_solver import CONSTS

st, d, x0, free = tt.tracking_problem()
f = lambda x0, free, d: track_solve.lm_solve_track(
    x0, free, d, CONSTS, max_iters=8
)
import time
t0 = time.time()
traced = jax.jit(f).trace(x0, free, d)
print(f"traced OK {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
lowered = traced.lower()
print(f"lowered OK {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
lowered.compile()
print(f"compiled OK {time.time()-t0:.0f}s", flush=True)
