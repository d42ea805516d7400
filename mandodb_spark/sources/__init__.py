from .segment_store import SegmentStore

__all__ = ["SegmentStore"]
