from . import tsdb_ops

__all__ = ["tsdb_ops"]
