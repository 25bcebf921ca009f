"""Physical constants.

The reference hardcodes g = 9.80616 inside its pressure-gradient kernel
(reference: src/ocn/Tendencies/normalVelocity/pressure_gradient.jl:63) and
mirrors it in the analytic solutions (src/inertialGravityWave.jl:7). Here it
is a single named constant used everywhere.
"""

GRAVITY = 9.80616
