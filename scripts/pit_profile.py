"""Measure the graetz / mul PIT benches in isolation (TPU), with
CADNIP_PIT_DEBUG per-exec timing. Usage: python scripts/pit_profile.py
[graetz|mul] [window] [wpe]."""
import os
import sys
import time

os.environ.setdefault("CADNIP_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/cadnip_tpu_xla"))
os.environ.setdefault("CADNIP_PIT_DEBUG", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import bench as B  # noqa: E402
import cadnip_tpu as ct  # noqa: E402
from cadnip_tpu.analyses.tran_pit import tran_pit  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "graetz"
if which == "graetz":
    cc = ct.parse_spice(B.GRAETZ)
    span, dt = (0, 1.0), 1e-6
    kw = dict(window=int(sys.argv[2]) if len(sys.argv) > 2 else 8192,
              windows_per_exec=int(sys.argv[3]) if len(sys.argv) > 3 else 16)
else:
    cc = ct.parse_spice(B.MUL)
    span, dt = (0, 5e-3), 1e-8
    kw = dict(window=int(sys.argv[2]) if len(sys.argv) > 2 else 1000,
              windows_per_exec=int(sys.argv[3]) if len(sys.argv) > 3 else 16,
              max_iters=96)

t0 = time.perf_counter()
sol = tran_pit(cc, span, dt, **kw)
sol.xs.block_until_ready()
print(f"{which} warmup (incl. compile): {time.perf_counter() - t0:.2f}s",
      file=sys.stderr)
for _ in range(2):
    t0 = time.perf_counter()
    sol = tran_pit(cc, span, dt, **kw)
    sol.xs.block_until_ready()
    print(f"{which} run: {time.perf_counter() - t0:.2f}s, "
          f"nn={int(np.asarray(sol.stats.nnewton))}, "
          f"fail={bool(np.asarray(sol.stats.fail))}", file=sys.stderr)
if which == "graetz":
    rmse = B.golden_rmse(sol, "graetz", "outp", "outn", scale=20.0)
else:
    rmse = B.golden_rmse(sol, "mul", "20", scale=50.0)
print(f"{which} golden rel-RMSE: {rmse:.2e}", file=sys.stderr)
