from .algorithms import (  # noqa: F401
    rnea, crba, fd, fd_and_grad, fk, ee_position, ee_xyz_jacobian,
    kinetic_energy, potential_energy,
)
