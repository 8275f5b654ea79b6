from .ipm import IPMOptions, IPMResult, build_ipm_solver  # noqa: F401
