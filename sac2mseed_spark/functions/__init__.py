from .metrics import METRIC_COLS, derive_turn_metrics, slim_metrics  # noqa: F401
from .selections import (  # noqa: F401
    apply_selections,
    glob_match,
    glob_to_regex,
    override_col,
    override_source,
)
