from .metrics import derive_turn_metrics, METRIC_COLS  # noqa: F401
