from crowdmod_tpu.train.optim import adam_with_plateau, PlateauState
from crowdmod_tpu.train.state import TrainState

__all__ = ["adam_with_plateau", "PlateauState", "TrainState"]
