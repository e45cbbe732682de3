from .rtdetr.model import RTDETR

__all__ = ["RTDETR"]
