"""Hot-path ops with swappable XLA / Pallas implementations."""

from .statsq_matmul import statsq_matmul, set_default_impl

__all__ = ["statsq_matmul", "set_default_impl"]
