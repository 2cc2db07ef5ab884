"""Interactive explorer (reference `ext/CadnipMakieExt.jl` parity),
exercised headless: sliders discovered from alterable params, `set()`
re-runs the jitted transient and updates the plotted data in place."""
import matplotlib

matplotlib.use("Agg")

import numpy as np

import cadnip_tpu as ct

RC = """rc lowpass
v1 in 0 dc 0 pulse 0 1 0 1n 1n 1 2
r1 in out 1k
c1 out 0 1u
.end
"""


def test_explore_headless_set():
    cc = ct.parse_spice(RC)
    ex = ct.explore(cc, (0.0, 5e-3), dt=5e-6, outputs=["out"], show=False)
    # default slider discovery found the positive scalar params
    assert "r1.r" in ex.sliders and "c1.c" in ex.sliders
    v0 = ex.values("out").copy()
    ts = ex.ts
    # tau = 1 ms: by 5 ms (5 tau) the output is within exp(-5) of 1 V
    assert abs(v0[-1] - 1.0) < 1e-2
    # closed form at tau
    i_tau = int(np.argmin(np.abs(ts - 1e-3)))
    assert abs(v0[i_tau] - (1 - np.exp(-1.0))) < 5e-3

    # slow the pole 5x: at t=1ms the response must now be much lower
    ex.set("r1.r", 5e3)
    v1 = ex.values("out")
    assert abs(v1[i_tau] - (1 - np.exp(-0.2))) < 5e-3
    # the slider readout follows a programmatic set()
    assert ex.sliders["r1.r"].valtext.get_text() == "5000"

    # and back: restores the original waveform
    ex.set("r1.r", 1e3)
    assert np.allclose(ex.values("out"), v0, atol=1e-9)


def test_explore_custom_run_and_errors():
    cc = ct.parse_spice(RC)
    calls = []

    def run(p):
        calls.append(1)
        return ct.tran(cc, (0.0, 1e-3), dt=1e-5, params=p)

    ex = ct.explore(cc, (0.0, 1e-3), sliders=["c1.c"], outputs=["out"],
                    run=run, show=False)
    assert len(calls) == 1
    ex.set("c1.c", 2e-6)
    assert len(calls) == 2
    try:
        ex.set("bogus.param", 1.0)
    except KeyError as e:
        assert "bogus.param" in str(e)
    else:
        raise AssertionError("expected KeyError for unknown param")
