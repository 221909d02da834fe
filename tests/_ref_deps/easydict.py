"""Minimal EasyDict: dict with recursive attribute access (public API)."""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            return EasyDict(v)
        if isinstance(v, (list, tuple)):
            t = type(v)
            return t(EasyDict._wrap(x) for x in v)
        return v

    def __setattr__(self, name, value):
        value = EasyDict._wrap(value)
        super().__setattr__(name, value)
        self[name] = value

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        object.__delattr__(self, name)

    def update(self, e=None, **kwargs):
        d = dict(e or {})
        d.update(kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def pop(self, k, *args):
        if hasattr(self, k):
            object.__delattr__(self, k)
        return super().pop(k, *args)
