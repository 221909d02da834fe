from crowdmod_tpu.models.diffusion.ddpm import (
    as_eps_fn,
    ddim_eta_sample,
    ddim_sample,
    ddpm_loss,
    ddpm_sample,
    prediction_target,
)
from crowdmod_tpu.models.diffusion.distill import (
    distill_grid,
    distill_loss,
    distilled_sample,
)
from crowdmod_tpu.models.diffusion.dpm_solver import dpm_solver_sample

__all__ = [
    "as_eps_fn",
    "prediction_target",
    "ddpm_loss",
    "ddpm_sample",
    "ddim_sample",
    "ddim_eta_sample",
    "distill_grid",
    "distill_loss",
    "distilled_sample",
    "dpm_solver_sample",
]
