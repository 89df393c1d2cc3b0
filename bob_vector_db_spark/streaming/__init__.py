from . import ingest, windows

__all__ = ["ingest", "windows"]
