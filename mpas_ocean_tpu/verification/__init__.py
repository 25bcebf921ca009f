from .inertial_gravity_wave import InertialGravityWave
from .manufactured import PlanarTestFields

__all__ = ["InertialGravityWave", "PlanarTestFields"]
