from . import assigners, coders, structures  # noqa: F401
