from . import infolog, plot  # noqa: F401
