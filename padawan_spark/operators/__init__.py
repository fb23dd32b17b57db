from .asof import asof_join  # noqa: F401
from .skew import salted_aggregate, salted_join  # noqa: F401
