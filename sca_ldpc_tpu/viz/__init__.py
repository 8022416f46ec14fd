from .plots import (
    load_data,
    view_hqc_oracle_accuracy,
    view_hqc_simulation_csv,
    wide_to_long_format,
)

__all__ = [
    "load_data",
    "view_hqc_oracle_accuracy",
    "view_hqc_simulation_csv",
    "wide_to_long_format",
]
