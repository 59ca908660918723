"""Panchromatic ski file end-to-end (BASELINE config-2 style)."""

import numpy as np
import pytest

from skirt_tpu.log import SilentLog
from skirt_tpu.ski import load_ski

PAN_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <PanMonteCarloSimulation packages="800">
    <units type="Units"><ExtragalacticUnits/></units>
    <wavelengthGrid type="PanWavelengthGrid">
      <LogWavelengthGrid minWavelength="0.1 micron" maxWavelength="1000 micron" points="20"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem>
        <components type="StellarComp">
          <PanStellarComp>
            <geometry type="Geometry"><PointGeometry/></geometry>
            <sed type="StellarSED"><BlackBodySED temperature="6000 K"/></sed>
            <normalization type="StellarCompNormalization">
              <BolLuminosityStellarCompNormalization luminosity="1e6 Lsun"/>
            </normalization>
          </PanStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <dustSystem type="PanDustSystem">
      <PanDustSystem sampleCount="4" selfAbsorption="false" writeTemperature="true">
        <dustDistribution type="DustDistribution">
          <CompDustDistribution>
            <components type="DustComp">
              <DustComp>
                <geometry type="Geometry">
                  <ShellGeometry minRadius="0.03 pc" maxRadius="0.2 pc" expon="2"/>
                </geometry>
                <mix type="DustMix"><MeanZubkoDustMix/></mix>
                <normalization type="DustCompNormalization">
                  <RadialDustCompNormalization wavelength="0.55 micron" opticalDepth="2.0"/>
                </normalization>
              </DustComp>
            </components>
          </CompDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <Sphere1DDustGrid maxR="0.25 pc">
            <meshR type="Mesh"><LogMesh numBins="24" centralBinFraction="0.01"/></meshR>
          </Sphere1DDustGrid>
        </dustGrid>
        <dustEmissivity type="DustEmissivity"><GreyBodyDustEmissivity/></dustEmissivity>
        <dustLib type="DustLib"><AllCellsDustLib/></dustLib>
      </PanDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="1 Mpc" inclination="30 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </PanMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


def test_pan_ski_runs_with_spherical_grid(tmp_path):
    from skirt_tpu.constants import L_SUN
    p = tmp_path / "shell.ski"
    p.write_text(PAN_SKI)
    sim = load_ski(str(p), out_dir=str(tmp_path), prefix="shell", log=SilentLog(),
                   batch_size=1 << 13)
    from skirt_tpu.engine.pan import PanSimulation
    assert isinstance(sim, PanSimulation)
    assert not sim.self_absorption
    acc = sim.run()
    F = acc["instruments"][0]["Ftot"]
    total = F.sum()
    # spherical symmetry: energy conserved through re-emission
    assert total == pytest.approx(1e6 * L_SUN, rel=0.08)
    # IR re-emission present
    lam = sim.wavelength_grid.lambdav
    assert F[lam > 10e-6].sum() > 0.2 * total
    # temperature cuts were written
    import os
    assert os.path.exists(tmp_path / "shell_ds_tempxy.fits")
