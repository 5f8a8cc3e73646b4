from .model import InsMOSModel  # noqa: F401
