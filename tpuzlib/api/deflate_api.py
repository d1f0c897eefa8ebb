"""Placeholder — implemented in the deflate milestone."""
class Deflater:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError
def deflate(*a, **k):  # pragma: no cover
    raise NotImplementedError
