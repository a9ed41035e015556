from .surgery import prune_model

__all__ = ["prune_model"]
