from . import mesh, train_state  # noqa: F401
