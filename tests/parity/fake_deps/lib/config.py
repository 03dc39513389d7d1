"""HoHoNet lib.config placeholder: names imported by salve/utils/infer_depth.py."""

config = None


def update_config(*args, **kwargs):
    raise NotImplementedError("fake lib.config: HoHoNet inference is not runnable here")
