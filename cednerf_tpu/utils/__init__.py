from .cache import enable_compile_cache  # noqa: F401
from .math import trunc_exp  # noqa: F401
from .platform import respect_platform_env  # noqa: F401
