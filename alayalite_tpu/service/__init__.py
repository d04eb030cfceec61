from .app import ServiceApp, create_app, serve

__all__ = ["ServiceApp", "create_app", "serve"]
