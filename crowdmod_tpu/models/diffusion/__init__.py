from crowdmod_tpu.models.diffusion.ddpm import (
    ddpm_loss,
    ddpm_sample,
    ddim_sample,
)

__all__ = ["ddpm_loss", "ddpm_sample", "ddim_sample"]
