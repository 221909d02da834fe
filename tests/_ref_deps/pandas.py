"""Import-surface pandas shim.

The reference imports pandas at module scope in its data/metrics modules,
but the protocol-parity tests only exercise the CSV paths (np.savetxt) and
no-op the boxplot step, so nothing here needs to work beyond import time.
"""


class _Mode:
    chained_assignment = None


class _Options:
    mode = _Mode()


options = _Options()


class DataFrame:  # pragma: no cover - only here so isinstance/refs resolve
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "pandas shim: DataFrame not available; parity tests compare the "
            "CSV artifacts directly and skip boxplot rendering"
        )


def read_csv(*a, **k):  # pragma: no cover
    raise NotImplementedError("pandas shim: read_csv not available")
