"""No-op wandb shim: the reference logs metrics to W&B unconditionally;
this environment is zero-egress so every call is swallowed."""


class _Run:
    def __init__(self):
        self.config = {}
        self.name = "offline-stub"

    def log(self, *a, **k):
        pass

    def finish(self, *a, **k):
        pass


run = None


def init(*args, **kwargs):
    global run
    run = _Run()
    return run


def log(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass


def agent(*args, **kwargs):
    raise RuntimeError("wandb.agent unavailable in the offline shim")
