"""REST service layer (SURVEY §7.4)."""

from .server import HttpServer, serve, wait_for_shutdown  # noqa: F401
from .routes import build_app  # noqa: F401
