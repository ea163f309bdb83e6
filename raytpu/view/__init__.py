"""Live interactive viewer (reference realtime SDL loop analog)."""

from raytpu.view.server import ViewerApp, serve

__all__ = ["ViewerApp", "serve"]
