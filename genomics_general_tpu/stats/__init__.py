from . import popgen, abbababa  # noqa: F401
