"""colour shim: only `Color` with `range_to`, used by salve/utils/colormap.py."""


class Color:
    def __init__(self, *args, **kwargs):
        pass

    def range_to(self, other, steps):
        return [Color() for _ in range(steps)]

    def get_rgb(self):
        return (0.0, 0.0, 0.0)
