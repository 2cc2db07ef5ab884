"""c6288 16x16 CMOS multiplier deck builder (ISCAS-85 netlist from the
reference benchmark suite, `/root/reference/benchmarks/vacask/c6288/`,
10,112 FETs) with level-1 MOS stand-ins for the PSP103 wrappers.

`access_r=True` adds drain/source access resistors inside each FET
wrapper (the physical role of the reference wrappers' ld/ls access
geometry): two internal nodes per FET grow the system to exactly the
reference's 25,380-node count (212k unknowns there come from PSP103's
additional per-FET internal unknowns)."""
import os

MULT_INC = ("/root/reference/benchmarks/vacask/c6288/ngspice/"
            "multiplier.inc")
C6288_MODELS = ("/root/reference/benchmarks/vacask/c6288/vacask/"
                "models.inc")
PSP_VA = "/root/reference/models/PSPModels.jl/va/psp103.va"


def have_sources() -> bool:
    return os.path.exists(MULT_INC)


def psp_models_block() -> str:
    """PSP103 wrapper subckts + model cards translated from the
    reference benchmark's own `models.inc` (the configuration whose
    212k-unknown ms/NR VACASK reports) — tier-2 VA model-card
    resolution through the netlist path."""
    from cadnip_tpu.models.ring import parse_vacask_models
    cards = parse_vacask_models(C6288_MODELS)

    def card(name):
        ps = " ".join(f"{k}={v:g}" for k, v in sorted(cards[name].items()))
        return f".model {name} PSP103VA ({ps})"

    return f"""* PSP103 wrappers (reference c6288 vacask/models.inc)
.global vdd vss
.option itl1=500
.hdl "{PSP_VA}"
{card('psp103n')}
{card('psp103p')}
.subckt nmos d g s b w=1u l=0.2u ld=0.5u ls=0.5u
  nm d g s b psp103n w={{w}} l={{l}} as={{w*ls}} ad={{w*ld}} ps={{2*(w+ls)}} pd={{2*(w+ld)}}
.ends
.subckt pmos d g s b w=1u l=0.2u ld=0.5u ls=0.5u
  nm d g s b psp103p w={{w}} l={{l}} as={{w*ls}} ad={{w*ld}} ps={{2*(w+ls)}} pd={{2*(w+ld)}}
.ends
"""


def build_deck(access_r: bool = False, copies: int = 1,
               psp: bool = False) -> str:
    if psp:
        assert not access_r
        mult = open(MULT_INC).read()
        drv = ["vdd vdd 0 1.2", "vss vss 0 0",
               ".subckt v01 out ref\n  vdrv int 0 pulse 0 1.2 0.1n 0.1n\n"
               "  rdrv int out 1\n.ends"]
        for i in range(16):
            drv.append(f"xa{i} a{i} 0 v01")
            drv.append(f"xb{i} b{i} 0 v01")
        ports = " ".join([f"a{i}" for i in range(16)]
                         + [f"b{i}" for i in range(16)]
                         + [f"p{i}" for i in range(32)])
        return ("c6288 psp103\n" + psp_models_block() + mult + "\n"
                + "\n".join(drv) + f"\nx1 {ports} c6288\n")
    if access_r:
        nbody = ("  rd d di 150\n  mn di g si b nch w={w} l={l}\n"
                 "  rs si s 150")
        pbody = ("  rd d di 150\n  mp di g si b pch w={w} l={l}\n"
                 "  rs si s 150")
    else:
        nbody = "  mn d g s b nch w={w} l={l}"
        pbody = "  mp d g s b pch w={w} l={l}"
    models = f"""* level-1 stand-in for the PSP103 wrappers
.global vdd vss
.option itl1=500
.subckt nmos d g s b w=1u l=0.2u ld=0.5u ls=0.5u
{nbody}
.ends
.subckt pmos d g s b w=1u l=0.2u ld=0.5u ls=0.5u
{pbody}
.ends
.model nch nmos vto=0.4 kp=200u lambda=0.05 cbd=0.1f cbs=0.1f
.model pch pmos vto=-0.4 kp=80u lambda=0.05 cbd=0.1f cbs=0.1f
"""
    mult = open(MULT_INC).read()
    drv = ["vdd vdd 0 1.2", "vss vss 0 0",
           ".subckt v01 out ref\n  vdrv int 0 pulse 0 1.2 0.1n 0.1n\n"
           "  rdrv int out 1\n.ends"]
    insts = []
    for m in range(copies):
        p = f"m{m}_" if copies > 1 else ""
        for i in range(16):
            drv.append(f"xa{p}{i} {p}a{i} 0 v01")
            drv.append(f"xb{p}{i} {p}b{i} 0 v01")
        ports = " ".join([f"{p}a{i}" for i in range(16)]
                         + [f"{p}b{i}" for i in range(16)]
                         + [f"{p}p{i}" for i in range(32)])
        insts.append(f"x{m + 1} {ports} c6288")
    return ("c6288\n" + models + mult + "\n" + "\n".join(drv)
            + "\n" + "\n".join(insts) + "\n")
