from .relational import add_surrogate_key, top1_per_group, union_conform_dedup

__all__ = ["add_surrogate_key", "top1_per_group", "union_conform_dedup"]
