from . import ingest, queue_source, stateful, windows

__all__ = ["ingest", "queue_source", "stateful", "windows"]
