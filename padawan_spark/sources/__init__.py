from .readers import (  # noqa: F401
    scan_csv,
    scan_json,
    write_csv,
    write_json,
)
