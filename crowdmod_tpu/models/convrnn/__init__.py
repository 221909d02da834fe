from crowdmod_tpu.models.convrnn.cells import ConvGRUCell, ConvLSTMCell, CELLS
from crowdmod_tpu.models.convrnn.forecaster import Encoder, Forecaster
from crowdmod_tpu.models.convrnn.losses import (
    kl_poisson_loss,
    kl_gaussian_loss,
    velocity_mse_loss,
    convrnn_loss,
)

__all__ = [
    "ConvGRUCell",
    "ConvLSTMCell",
    "CELLS",
    "Encoder",
    "Forecaster",
    "kl_poisson_loss",
    "kl_gaussian_loss",
    "velocity_mse_loss",
    "convrnn_loss",
]
