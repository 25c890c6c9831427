from . import affinity, breakdown, matcher  # noqa: F401
from .mean_ap import (FlexibleStatisticsEval, average_precision,
                      eval_map_flexible)
