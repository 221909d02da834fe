from crowdmod_tpu.models.flow_matching.fm import (
    fm_loss,
    euler_sample,
    heun_sample,
    linear_interpolant,
    conic_interpolant,
    INTERPOLANTS,
    INTEGRATORS,
)

__all__ = [
    "fm_loss",
    "euler_sample",
    "heun_sample",
    "linear_interpolant",
    "conic_interpolant",
    "INTERPOLANTS",
    "INTEGRATORS",
]
