"""gtsfm.utils.geometry_comparisons placeholder; nothing here runs on Stage A."""


def __getattr__(name):
    def _unavailable(*args, **kwargs):
        raise NotImplementedError(f"fake gtsfm: geometry_comparisons.{name} is not implemented")

    return _unavailable
