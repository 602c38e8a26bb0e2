from . import loading, transforms_3d, formating  # noqa: F401
