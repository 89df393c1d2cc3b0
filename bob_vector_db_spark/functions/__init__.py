from . import hashing, text, vector

__all__ = ["hashing", "text", "vector"]
