from crowdmod_tpu.utils.tracker import RunTracker
from crowdmod_tpu.utils.profiling import StepTimer, trace

__all__ = ["RunTracker", "StepTimer", "trace"]
