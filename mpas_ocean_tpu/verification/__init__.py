from .inertial_gravity_wave import InertialGravityWave
from .internal_wave import InternalWave
from .kelvin_wave import KelvinWave
from .manufactured import PlanarTestFields
from .rossby_wave import RossbyWave
from .stommel_gyre import StommelGyre

__all__ = [
    "InertialGravityWave",
    "InternalWave",
    "KelvinWave",
    "PlanarTestFields",
    "RossbyWave",
    "StommelGyre",
]
