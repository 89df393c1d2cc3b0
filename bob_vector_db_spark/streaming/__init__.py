from . import ingest, stateful, windows

__all__ = ["ingest", "stateful", "windows"]
