"""Interactive console construction of ski configurations.

ref: Discover/ConsoleHierarchyCreator.hpp:22-40 — `skirt` with no
arguments walks the allowed components of each compound property,
prompting for choices and values, then writes the ski file
(SkirtCommandLineHandler.cpp:89-124).

This guided builder covers the common oligochromatic/panchromatic setups
through the SUPPORTED registry; input/output streams are injectable for
scripted use and testing.
"""

from __future__ import annotations

import sys

from .discover import SUPPORTED, write_ski
from .ski import Node


class ConsoleCreator:
    def __init__(self, stdin=None, stdout=None):
        self.fin = stdin or sys.stdin
        self.fout = stdout or sys.stdout

    def _say(self, text: str):
        self.fout.write(text + "\n")

    def _ask(self, prompt: str, default: str | None = None) -> str:
        sfx = f" [{default}]" if default is not None else ""
        self.fout.write(f"{prompt}{sfx}: ")
        self.fout.flush()
        line = self.fin.readline()
        if not line:
            raise EOFError("input stream closed")
        line = line.strip()
        return line if line else (default or "")

    def _choose(self, prompt: str, options: list[str], default: int = 1) -> str:
        self._say(prompt)
        for i, opt in enumerate(options, 1):
            self._say(f"  {i}. {opt}")
        while True:
            ans = self._ask("enter a number", str(default))
            try:
                k = int(ans)
                if 1 <= k <= len(options):
                    return options[k - 1]
            except ValueError:
                pass
            self._say("please enter a valid option number")

    def _of_kind(self, kind: str) -> list[str]:
        return sorted(n for n, m in SUPPORTED.items() if m["kind"] == kind)

    def _build_component(self, cls: str) -> Node:
        meta = SUPPORTED[cls]
        attrs = {}
        for prop in meta.get("properties", []):
            val = self._ask(f"{cls}.{prop}", "")
            if val:
                attrs[prop] = val
        node = Node(cls, attrs)
        for child_prop in meta.get("children", []):
            kind = _child_kind(cls, child_prop)
            options = self._of_kind(kind)
            if not options:
                continue
            chosen = self._choose(f"select the {child_prop} for {cls}", options)
            node.children[child_prop] = [self._build_component(chosen)]
        return node

    def create(self) -> Node:
        """Interactively build a simulation Node tree."""
        sim_cls = self._choose(
            "what kind of simulation?",
            ["OligoMonteCarloSimulation", "PanMonteCarloSimulation"])
        attrs = {"packages": self._ask("number of photon packages", "1e6")}
        sim = Node(sim_cls, attrs)

        units = self._choose("units system",
                             ["ExtragalacticUnits", "StellarUnits", "SIUnits"])
        sim.children["units"] = [Node(units, {})]

        wg = self._choose("wavelength grid",
                          self._of_kind("wavelengthGrid"))
        sim.children["wavelengthGrid"] = [self._build_component(wg)]

        # stellar system with one component
        comp_cls = "OligoStellarComp" if sim_cls.startswith("Oligo") \
            else "PanStellarComp"
        ss = Node("StellarSystem", {})
        ss.children["components"] = [self._build_component(comp_cls)]
        sim.children["stellarSystem"] = [ss]

        if self._ask("include a dust system? (yes/no)", "yes").lower() \
                .startswith("y"):
            ds_cls = "OligoDustSystem" if sim_cls.startswith("Oligo") \
                else "PanDustSystem"
            ds = Node(ds_cls, {})
            comp = Node("DustComp", {})
            geo = self._choose("dust geometry", self._of_kind("geometry"))
            comp.children["geometry"] = [self._build_component(geo)]
            mix = self._choose("dust mix", self._of_kind("dustMix"))
            comp.children["mix"] = [self._build_component(mix)]
            norm = self._choose("dust normalization",
                                self._of_kind("dustNormalization"))
            comp.children["normalization"] = [self._build_component(norm)]
            dist = Node("CompDustDistribution", {})
            dist.children["components"] = [comp]
            ds.children["dustDistribution"] = [dist]
            grid = self._choose("dust grid", self._of_kind("dustGrid"))
            ds.children["dustGrid"] = [self._build_component(grid)]
            sim.children["dustSystem"] = [ds]

        ins_sys = Node("InstrumentSystem", {})
        instruments = []
        while True:
            ins = self._choose("add an instrument", self._of_kind("instrument"))
            instruments.append(self._build_component(ins))
            if not self._ask("add another instrument? (yes/no)", "no") \
                    .lower().startswith("y"):
                break
        ins_sys.children["instruments"] = instruments
        sim.children["instrumentSystem"] = [ins_sys]
        return sim

    def create_and_write(self, path: str) -> Node:
        node = self.create()
        write_ski(node, path)
        self._say(f"Successfully created ski file '{path}'.")
        return node


def _child_kind(cls: str, child_prop: str) -> str:
    mapping = {
        "geometry": "geometry", "firstGeometry": "geometry",
        "secondGeometry": "geometry", "sed": "sed",
        "normalization": "stellarNormalization",
        "meshX": "mesh", "meshY": "mesh", "meshZ": "mesh", "meshR": "mesh",
        "mix": "dustMix",
    }
    return mapping.get(child_prop, "geometry")
