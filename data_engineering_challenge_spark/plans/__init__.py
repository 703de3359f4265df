"""Physical-plan inspection and assertion toolkit."""

from .checks import (  # noqa: F401
    count_exchanges,
    physical_plan,
    scan_sections,
)
