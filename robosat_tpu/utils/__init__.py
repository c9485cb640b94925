from robosat_tpu.utils.plot import plot  # noqa: F401
