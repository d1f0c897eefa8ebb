"""Placeholder — implemented in the inflate milestone."""
class Inflater:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError
class InflateResult:  # pragma: no cover
    pass
def inflate(*a, **k):  # pragma: no cover
    raise NotImplementedError
