"""Streaming queries register into the same inventory registry as batch
queries (the driver contract is one flat dict)."""

from ..queries._registry import register

__all__ = ["register"]
