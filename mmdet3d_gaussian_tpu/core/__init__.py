from . import anchor, schedules  # noqa: F401
from . import evaluation  # noqa: F401
from .bbox import assigners, coders, structures  # noqa: F401
from . import visualizer  # noqa: F401
