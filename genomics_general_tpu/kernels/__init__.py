from . import counts, pairdist  # noqa: F401
