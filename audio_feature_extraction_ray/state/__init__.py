from .kernels import SignalsLookup, StreamingMerger, merge_partition

__all__ = ["SignalsLookup", "StreamingMerger", "merge_partition"]
