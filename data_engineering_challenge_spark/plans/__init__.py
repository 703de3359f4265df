"""Physical-plan inspection and assertion toolkit."""

from .checks import (  # noqa: F401
    count_exchanges,
    executed_adaptive_plan,
    live_operator_count,
    physical_plan,
    scan_sections,
)
