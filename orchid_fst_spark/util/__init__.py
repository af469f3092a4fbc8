from .caches import LFUCache, LRUCache

__all__ = ["LFUCache", "LRUCache"]
