"""Benchmark harness (driver runs this on real TPU hardware).

Headline metric: the VACASK 'rc' benchmark — an RC circuit driven by a pulse
train, transient over 1 s with 1 us max step (~1,000,001 timepoints), the
exact circuit/stepping of `/root/reference/benchmarks/vacask/rc`
(baselines, AMD TR 7970 1-thread: VACASK 0.94 s, Ngspice 1.31 s, Xyce 9.39 s).

On TPU the circuit is linear, so the fixed-step trapezoidal recurrence is
evaluated by blocked prefix products (`analyses/tran_linear.py`) — the whole
1M-step integration is a few thousand batched einsum steps.

Methodology: 1 untimed warmup (includes jit compile; compile time excluded as
is standard for JIT systems — reported separately on stderr), then 5 timed
runs, mean. Secondary metrics (stderr): DFF transient wall-clock + Newton
solves/sec, 4096-way vmapped DFF-family Monte-Carlo throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline = VACASK_seconds / our_seconds  (>1 means faster than the best
baseline simulator).
"""
import json
import os
import sys
import time

os.environ.setdefault("CADNIP_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/cadnip_tpu_xla"))

import numpy as np

RC_NETLIST = """RC circuit excited by a pulse train
vs 1 0 dc 0 pulse 0 1 1u 1u 1u 1m 2m
r1 1 2 1k
c1 2 0 1u
.end
"""

VACASK_RC_SECONDS = 0.94


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_rc():
    import cadnip_tpu as ct
    from cadnip_tpu.analyses.tran_linear import tran_linear

    cc = ct.parse_spice(RC_NETLIST)
    dt = 1e-6
    tstop = 1.0

    t0 = time.perf_counter()
    sol = tran_linear(cc, (0, tstop), dt)
    np.asarray(sol.xs[-1])
    log(f"rc warmup (incl. compile): {time.perf_counter() - t0:.2f}s, "
        f"{sol.xs.shape[0]} timepoints")

    # sanity: value vs analytic steady behavior (pulse 1ms on / 1ms off)
    v2 = np.asarray(sol["2"])
    assert v2.shape[0] == 1_000_001
    assert np.isfinite(v2).all()
    assert abs(float(v2[1000]) - (1 - np.exp(-1))) < 5e-3

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sol = tran_linear(cc, (0, tstop), dt)
        sol.xs.block_until_ready()
        times.append(time.perf_counter() - t0)
    wall = float(np.mean(times))
    log(f"rc timed runs: {['%.3f' % t for t in times]} -> mean {wall:.3f}s")
    return wall


def bench_dff():
    import cadnip_tpu as ct
    from cadnip_tpu.models.dff import dff_netlist

    cc = ct.parse_spice(dff_netlist())
    t0 = time.perf_counter()
    sol = ct.tran(cc, (0, 6e-7), dt=3.333e-10, max_steps=20000)
    sol.xs.block_until_ready()
    log(f"dff warmup (incl. compile): {time.perf_counter() - t0:.2f}s")
    q = np.asarray(sol["q"])
    ts = sol.ts
    ok = (q[np.argmin(np.abs(ts - 350e-9))] < 1.0
          and q[np.argmin(np.abs(ts - 550e-9))] > 4.0)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol = ct.tran(cc, (0, 6e-7), dt=3.333e-10, max_steps=20000)
        sol.xs.block_until_ready()
        times.append(time.perf_counter() - t0)
    wall = float(np.mean(times))
    nnewton = int(np.asarray(sol.stats.nnewton))
    log(f"dff: {wall:.3f}s, {nnewton} newton solves, "
        f"{nnewton / wall:.0f} solves/s, latch_ok={ok}")
    return wall, nnewton / wall, ok


def bench_dff_sweep(batch=1024):
    import cadnip_tpu as ct
    from cadnip_tpu.models.dff import dff_netlist

    cc = ct.parse_spice(dff_netlist())
    # Monte-Carlo over output-stage strengths and load cap
    tab = ct.montecarlo_table(cc, {"cq.c": 0.1, "mno1.w": 0.1,
                                   "mpo1.w": 0.1}, batch, seed=42)
    t0 = time.perf_counter()
    sol = ct.transweep(cc, tab, (0, 6e-7), dt=3.333e-10, max_steps=20000,
                       n_save=61)
    sol.xs.block_until_ready()
    warm = time.perf_counter() - t0
    log(f"dff {batch}-way sweep warmup (incl. compile): {warm:.2f}s")
    t0 = time.perf_counter()
    sol = ct.transweep(cc, tab, (0, 6e-7), dt=3.333e-10, max_steps=20000,
                       n_save=61)
    sol.xs.block_until_ready()
    wall = time.perf_counter() - t0
    per = wall / batch
    log(f"dff {batch}-way sweep: {wall:.2f}s total, "
        f"{per * 1e3:.3f} ms/circuit")
    return wall, per


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    rc_wall = bench_rc()
    if only == "all":
        try:
            bench_dff()
        except Exception as e:
            log(f"dff bench failed: {e!r}")
        try:
            bench_dff_sweep()
        except Exception as e:
            log(f"dff sweep bench failed: {e!r}")
    print(json.dumps({
        "metric": "vacask_rc_transient_1M_steps_wall_clock",
        "value": round(rc_wall, 4),
        "unit": "s",
        "vs_baseline": round(VACASK_RC_SECONDS / rc_wall, 2),
    }))


if __name__ == "__main__":
    main()
