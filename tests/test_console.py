"""Scripted test of the interactive console creator."""

import io

from skirt_tpu.console import ConsoleCreator
from skirt_tpu.discover import SUPPORTED


def idx(kind, name):
    options = sorted(n for n, m in SUPPORTED.items() if m["kind"] == kind)
    return str(options.index(name) + 1)


def test_console_builds_loadable_ski(tmp_path):
    answers = [
        "1",                                  # OligoMonteCarloSimulation
        "500",                                # packages
        "1",                                  # ExtragalacticUnits
        idx("wavelengthGrid", "OligoWavelengthGrid"),
        "1 micron",                           # wavelengths
        "1e7",                                # luminosities
        idx("geometry", "PointGeometry"),
        "no",                                 # no dust system
        idx("instrument", "SEDInstrument"),
        "sed0",                               # instrumentName
        "10 Mpc",                             # distance
        "0 deg", "", "",                      # inclination/azimuth/pa
        "no",                                 # no more instruments
    ]
    fin = io.StringIO("\n".join(answers) + "\n")
    fout = io.StringIO()
    creator = ConsoleCreator(stdin=fin, stdout=fout)
    path = str(tmp_path / "made.ski")
    node = creator.create_and_write(path)
    assert node.name == "OligoMonteCarloSimulation"

    # the written file loads and builds a runnable simulation
    import jax
    from skirt_tpu.log import SilentLog
    from skirt_tpu.ski import load_ski
    sim = load_ski(path, log=SilentLog(), packets=50)
    assert sim.nlambda == 1
    assert len(sim.instruments) == 1
