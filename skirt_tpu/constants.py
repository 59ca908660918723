"""Physical constants in SI units.

Mirrors the constant set used by the reference radiative-transfer code
(ref: SKIRTcore/Units.cpp) so that luminosity/flux calibrations agree.
"""

# speed of light [m/s]
C_LIGHT = 2.99792458e8
# Planck constant [J s]
H_PLANCK = 6.62606957e-34
# Boltzmann constant [J/K]
K_BOLTZMANN = 1.3806488e-23
# proton mass [kg]
M_PROTON = 1.67262178e-27
# electron mass [kg]
M_ELECTRON = 9.10938215e-31
# Thomson cross section [m^2]
SIGMA_THOMSON = 6.652458734e-29

# astronomical unit [m]
AU = 1.49597871e11
# parsec [m]
PC = 3.08567758e16
KPC = 1e3 * PC
MPC = 1e6 * PC
# solar luminosity [W]
L_SUN = 3.839e26
# solar mass [kg]
M_SUN = 1.9891e30
# solar radius [m]
R_SUN = 6.955e8
# light year [m]
LY = 9.460730472e15

# micron [m]
MICRON = 1e-6
ANGSTROM = 1e-10
NANOMETER = 1e-9

# arcsec in radians
ARCSEC = 4.84813681109536e-6
ARCSEC2 = ARCSEC * ARCSEC

# Jansky [W/m^2/Hz]
JANSKY = 1e-26
