from . import candidates, pgo  # noqa: F401
