"""Discover-layer tests: ski round trip, LaTeX report, schema export."""

import os
import xml.etree.ElementTree as ET

import pytest

from skirt_tpu.discover import latex_report, write_schema, write_ski
from skirt_tpu.ski import parse_ski
from tests.test_ski import OLIGO_SKI


class TestRoundTrip:
    def test_parse_write_parse(self, tmp_path):
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        node = parse_ski(str(p1))
        p2 = tmp_path / "out.ski"
        write_ski(node, str(p2))
        node2 = parse_ski(str(p2))

        def flatten(n):
            items = [(n.name, tuple(sorted(n.attrs.items())))]
            for prop in sorted(n.children):
                for c in n.children[prop]:
                    items.extend(flatten(c))
            return items

        assert flatten(node) == flatten(node2)

    def test_written_file_loads_and_builds(self, tmp_path):
        from skirt_tpu.log import SilentLog
        from skirt_tpu.ski import load_ski
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        p2 = tmp_path / "out.ski"
        write_ski(parse_ski(str(p1)), str(p2))
        sim = load_ski(str(p2), log=SilentLog(), packets=10)
        assert sim.nlambda == 2


class TestLatex:
    def test_report_contains_components(self, tmp_path):
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        out = tmp_path / "params.tex"
        latex_report(parse_ski(str(p1)), str(out))
        text = out.read_text()
        assert "\\documentclass" in text
        assert "ExpDiskGeometry" in text
        assert "radialScale=4400 pc" in text


class TestSchema:
    def test_schema_exports_supported_types(self, tmp_path):
        out = tmp_path / "schema.xml"
        write_schema(str(out))
        root = ET.parse(str(out)).getroot()
        names = {t.get("name") for t in root.findall("Type")}
        for required in ("OligoMonteCarloSimulation", "ExpDiskGeometry",
                        "SimpleInstrument", "CartesianDustGrid",
                        "MeanZubkoDustMix", "BlackBodySED"):
            assert required in names
