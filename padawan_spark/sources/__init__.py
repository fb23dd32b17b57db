from .readers import (  # noqa: F401
    scan_csv,
    scan_json,
    write_csv,
    write_json,
)
from .pysource import SequenceSource, register_python_sources  # noqa: F401,E402
