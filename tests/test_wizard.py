"""WizardEngine console wizard (ref: SkirtMakeUp/WizardEngine.hpp:19-57).

State-machine semantics: advance/retreat navigation, dirty tracking,
open/edit/save of ski hierarchies, fski creation, and the replay design's
invariant that retreat exactly rewinds one pane.
"""

import io

import pytest

from skirt_tpu.ski import parse_ski
from skirt_tpu.wizard import WizardEngine, write_fski


class TestStateMachine:
    def test_initial_state_is_basic_choice(self):
        w = WizardEngine()
        pane = w.current_pane()
        assert pane is not None and pane.options is not None
        assert "would you like to do" in pane.prompt
        assert not w.can_retreat()
        assert w.can_advance()
        assert not w.is_dirty()
        assert w.filepath() == ""

    def test_advance_and_retreat_rewind_exactly(self):
        w = WizardEngine()
        w.advance("1")                    # new ski
        p1 = w.current_pane()
        assert "simulation" in p1.prompt
        assert w.can_retreat() and w.is_dirty()
        w.advance("OligoMonteCarloSimulation")
        p2 = w.current_pane()
        assert "packages" in (p2.key + p2.prompt)
        w.retreat()
        assert w.current_pane().prompt == p1.prompt
        w.retreat()
        assert not w.can_retreat()
        assert "would you like to do" in w.current_pane().prompt

    def test_choice_accepts_number_name_or_default(self):
        w = WizardEngine()
        w.advance("create a new ski file")
        assert "simulation" in w.current_pane().prompt
        w.retreat()
        w.advance("")                     # default = first option
        assert "simulation" in w.current_pane().prompt


def _drive(wizard, answers):
    for a in answers:
        wizard.advance(a)


class TestNewSki:
    def test_full_walk_and_save(self, tmp_path):
        """Drive the whole new-ski walk by pane key (robust to the exact
        number of property panes each component contributes)."""
        out = str(tmp_path / "wiz.ski")
        w = WizardEngine()
        by_key = {
            "basic-choice": "1",
            "sim-type": "OligoMonteCarloSimulation",
            "packages": "2e5",
            "units": "SIUnits",
            "wavelengthGrid": "OligoWavelengthGrid",
            "OligoWavelengthGrid.wavelengths": "0.55 micron",
            "want-dust": "yes",
            "dust-geometry": "ExpDiskGeometry",
            "dust-mix": "MeanZubkoDustMix",
            "dust-normalization": "DustMassDustCompNormalization",
            "DustMassDustCompNormalization.dustMass": "1e31 kg",
            "dust-grid": "CartesianDustGrid",
            "instrument": "SEDInstrument",
            "more-instruments": "no",
            "save-path": out,
        }
        guard = 0
        while w.can_advance():
            pane = w.current_pane()
            if pane is None:
                break
            w.advance(by_key.get(pane.key, ""))
            guard += 1
            assert guard < 300, "wizard did not terminate"
        root, path = w.root(), w.filepath()
        assert path == out
        assert root.name == "OligoMonteCarloSimulation"
        from skirt_tpu.discover import write_ski
        write_ski(root, out)
        reread = parse_ski(out)
        assert reread.name == "OligoMonteCarloSimulation"
        assert reread.get("packages") == "2e5"
        assert reread.child("units").name == "SIUnits"
        assert reread.child("instrumentSystem") is not None
        comps = reread.child("dustSystem").child("dustDistribution") \
            .children["components"]
        assert comps[0].child("geometry").name == "ExpDiskGeometry"
        assert comps[0].child("normalization").get("dustMass") == "1e31 kg"

    def test_run_console_with_retreat(self, tmp_path):
        """The interactive loop honors '<' (retreat) mid-walk."""
        out = str(tmp_path / "fs.fski")
        answers = [
            "2",            # new fski
            "a.ski",
            "<",            # changed my mind about the template
            "b.ski",
            "hz", "length", "0.1 pc", "0.8 pc", "no",
            "ref.fits", "2.0", "0.1", "100", "no",
            "8", "4", "0.05", "0.7",
            out,
        ]
        fin = io.StringIO("\n".join(answers) + "\n")
        fout = io.StringIO()
        w = WizardEngine()
        root, path = w.run(stdin=fin, stdout=fout)
        assert path == out
        assert root.child("simulation").get("skiName") == "b.ski"
        assert not w.is_dirty()
        from skirt_tpu.fit.fski import parse_fski
        assert parse_fski(out).name == "OligoFitScheme"


class TestOpenEdit:
    def test_open_edit_roundtrip(self, tmp_path):
        src = str(tmp_path / "in.ski")
        dst = str(tmp_path / "out.ski")
        # build a small ski via the discover writer
        from skirt_tpu.discover import write_ski
        from skirt_tpu.ski import Node
        sim = Node("OligoMonteCarloSimulation", {"packages": "1e5"})
        sim.children["units"] = [Node("SIUnits", {})]
        wg = Node("OligoWavelengthGrid", {"wavelengths": "0.55 micron"})
        sim.children["wavelengthGrid"] = [wg]
        write_ski(sim, src)

        w = WizardEngine()
        w.advance("3")                    # open existing
        w.advance(src)                    # path
        pane = w.current_pane()
        assert pane.default == "1e5"      # current value is the default
        w.advance("3e5")                  # change packages
        w.advance("")                     # keep wavelengths
        w.advance(dst)                    # save as
        assert w.filepath() == dst
        # run() would have written; emulate the final write here
        from skirt_tpu.discover import write_ski as ws
        ws(w.root(), dst)
        reread = parse_ski(dst)
        assert reread.get("packages") == "3e5"
        assert reread.child("wavelengthGrid").name == "OligoWavelengthGrid"


class TestNewFski:
    def test_fski_roundtrips_through_parser(self, tmp_path):
        out = str(tmp_path / "wiz.fski")
        w = WizardEngine()
        _drive(w, [
            "2",                          # new fski
            "disc.ski",                   # ski template
            "hz",                         # range label
            "length",                     # quantity type
            "0.1 pc", "0.8 pc",           # min/max
            "no",                         # no more ranges
            "ref.fits", "1.5", "0.1", "100",
            "no",                         # no more images
            "8", "4", "0.05", "0.7",      # GA params
            out,                          # save as
        ])
        assert w.filepath() == out
        root = w.root()
        assert root.name == "OligoFitScheme"
        write_fski(root, out)

        from skirt_tpu.fit.fski import parse_fski
        node = parse_fski(out)
        assert node.child("simulation").get("skiName") == "disc.ski"
        rng = node.child("parameterRanges").children["ranges"][0]
        assert rng.get("label") == "hz"
        assert rng.get("minimumValue") == "0.1 pc"
        img = node.child("referenceImages").children["images"][0]
        assert img.get("path") == "ref.fits"
        assert img.child("convolution").get("fwhm") == "1.5"
        opt = node.child("optim")
        assert opt.get("popsize") == "8" and opt.get("generations") == "4"


class TestBadInput:
    def test_bad_open_path_reasks(self):
        w = WizardEngine()
        w.advance("3")                    # open existing
        with pytest.raises(ValueError):
            w.advance("/nonexistent/whatever.ski")
        # the bad answer was undone: still on the path pane
        assert "path" in w.current_pane().prompt
        assert len(w.answers) == 1

    def test_run_loop_reports_and_continues(self, tmp_path):
        from skirt_tpu.discover import write_ski
        from skirt_tpu.ski import Node
        src = str(tmp_path / "a.ski")
        sim = Node("OligoMonteCarloSimulation", {"packages": "1e5"})
        sim.children["units"] = [Node("SIUnits", {})]
        write_ski(sim, src)
        out = str(tmp_path / "b.ski")
        fin = io.StringIO("\n".join([
            "3", "/nope.ski",             # bad path -> error, re-asks
            src, "", out]) + "\n")
        fout = io.StringIO()
        root, path = WizardEngine().run(stdin=fin, stdout=fout)
        assert path == out
        assert "error:" in fout.getvalue()
