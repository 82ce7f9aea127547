from .math import trunc_exp  # noqa: F401
