from crowdmod_tpu.models.diffusion.ddpm import (
    ddpm_loss,
    ddpm_sample,
    ddim_sample,
)
from crowdmod_tpu.models.diffusion.distill import (
    distill_grid,
    distill_loss,
    distilled_sample,
)
from crowdmod_tpu.models.diffusion.dpm_solver import dpm_solver_sample

__all__ = [
    "ddpm_loss",
    "ddpm_sample",
    "ddim_sample",
    "distill_grid",
    "distill_loss",
    "distilled_sample",
    "dpm_solver_sample",
]
