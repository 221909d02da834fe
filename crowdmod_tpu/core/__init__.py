from crowdmod_tpu.core import layout, schedule, scene  # noqa: F401
