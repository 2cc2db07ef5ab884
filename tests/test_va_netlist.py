"""VA <-> SPICE integration: .hdl loading, tier-2 model resolution,
X/N instantiation of VA modules (reference sema two-tier resolution)."""
import os

import numpy as np
import pytest

from cadnip_tpu import dc, parse_spice

VA_FILE = """
`include "disciplines.vams"
module vares(p, n);
  inout p, n;
  electrical p, n;
  parameter real r = 1k from (0:inf);
  analog I(p, n) <+ V(p, n) / r;
endmodule

module vadiode(a, c);
  inout a, c;
  electrical a, c;
  parameter real is_ = 1e-14;
  parameter real n = 1.0;
  analog I(a, c) <+ is_ * (limexp(V(a, c) / (n * $vt)) - 1.0);
endmodule
"""


@pytest.fixture()
def va_path(tmp_path):
    p = tmp_path / "models.va"
    p.write_text(VA_FILE)
    return str(p)


def test_hdl_and_x_instantiation(va_path):
    cc = parse_spice(f"""va test
.hdl "{va_path}"
v1 in 0 5
x1 in out vares r=2k
x2 out 0 vares
""")
    sol = dc(cc)
    assert sol["out"] == pytest.approx(5.0 / 3.0, rel=1e-9)


def test_model_card_resolves_to_va(va_path):
    # .model whose TYPE is a VA module name: tier-2 resolution
    cc = parse_spice(f"""va tier2
.hdl "{va_path}"
.model myd vadiode (is_=1e-15)
v1 in 0 5
r1 in d 1k
d1 d 0 myd
""")
    sol = dc(cc)
    assert bool(sol.converged)
    assert 0.5 < float(sol["d"]) < 0.9


def test_n_element(va_path):
    cc = parse_spice(f"""va n-element
.hdl "{va_path}"
v1 in 0 1
n1 in 0 vares r=500
""")
    sol = dc(cc)
    assert sol.i("v1") == pytest.approx(-2e-3, rel=1e-9)
