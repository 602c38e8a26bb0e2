from . import loading, transforms_3d, formating, test_time_aug  # noqa: F401
