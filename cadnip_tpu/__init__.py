"""cadnip_tpu — a TPU-native (JAX/XLA/Pallas) analog circuit simulator.

A from-scratch rebuild of the capabilities of NyanCAD/Cadnip.jl (SPICE-class
MNA simulator): SPICE/Spectre netlist and Verilog-A front ends compile to
fixed-structure jitted stamp programs; DC/transient/AC/noise analyses run as
pure JAX with batched-dense linear algebra; parameter sweeps and Monte Carlo
are vmap over parameter pytrees, sharded over TPU meshes with shard_map.
"""
from . import config  # noqa: F401  (enables x64; must import first)

from .mna.structure import Circuit, CompiledCircuit  # noqa: E402
from .mna.spec import SimSpec  # noqa: E402
from .mna import devices  # noqa: E402
from .mna.devices import (  # noqa: E402
    RESISTOR, CAPACITOR, INDUCTOR, VSOURCE, ISOURCE, VCVS, VCCS, CCCS, CCVS,
    DIODE, DIODE_RS, MOSFET1, DeviceModel)
from .mna.waveforms import DC as DCWave, Pulse, Sin, PWL, Exp, Sffm  # noqa: E402
from .analyses.dc import dc, op_tran, DCSolution  # noqa: E402
from .analyses.tran import tran, TranSolution  # noqa: E402
from .analyses.ac import (  # noqa: E402
    ac, acdec, ACSolution, subsystem, DescriptorSISO)
from .analyses.noise import noise, NoiseSolution  # noqa: E402
from .analyses.sweeps import (  # noqa: E402
    Sweep, ProductSweep, TandemSweep, SerialSweep, dcsweep, transweep,
    montecarlo_table)
from .analyses.sensitivity import dc_sensitivity  # noqa: E402
from .frontend.elaborate import (  # noqa: E402
    parse_spice, simulate, circuit_from_file, register_pdk)
from .frontend.netlist import alter_text  # noqa: E402
from .frontend.introspect import (  # noqa: E402
    find, op_table, query, summary)
from .frontend.explore import explore, Explorer  # noqa: E402

__all__ = [
    "Circuit", "CompiledCircuit", "SimSpec", "DeviceModel", "devices",
    "RESISTOR", "CAPACITOR", "INDUCTOR", "VSOURCE", "ISOURCE", "VCVS",
    "VCCS", "CCCS", "CCVS", "DIODE", "DIODE_RS", "MOSFET1",
    "DCWave", "Pulse", "Sin", "PWL", "Exp", "Sffm",
    "dc", "op_tran", "DCSolution", "tran", "TranSolution",
    "ac", "acdec", "ACSolution", "subsystem", "DescriptorSISO",
    "noise", "NoiseSolution",
    "Sweep", "ProductSweep", "TandemSweep", "SerialSweep",
    "dcsweep", "transweep", "montecarlo_table", "dc_sensitivity",
    "parse_spice", "simulate", "circuit_from_file", "register_pdk",
    "alter_text",
    "find", "op_table", "query", "summary", "explore", "Explorer",
]

__version__ = "0.1.0"
