from crowdmod_tpu.models.flow_matching.fm import (
    fm_loss,
    euler_sample,
    heun_sample,
    linear_interpolant,
    conic_interpolant,
    INTERPOLANTS,
    INTEGRATORS,
)
from crowdmod_tpu.models.flow_matching.reflow import (
    generate_coupling,
    reflow_loss,
)

__all__ = [
    "fm_loss",
    "euler_sample",
    "heun_sample",
    "linear_interpolant",
    "conic_interpolant",
    "generate_coupling",
    "reflow_loss",
    "INTERPOLANTS",
    "INTEGRATORS",
]
