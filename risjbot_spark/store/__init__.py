from .snapshots import SnapshotTable

__all__ = ["SnapshotTable"]
