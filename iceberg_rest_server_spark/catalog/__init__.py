"""Catalog plane: a PySpark-compatible Iceberg-REST-style catalog.

This is the part of the reference that is *not* delegated to Spark —
table metadata, atomic commits, namespaces, warehouses (SURVEY.md §1,
§2A/B/C). Pure Python + stdlib (sqlite3 metastore, http.server REST
front), designed so a Spark session reads/writes tables through snapshot
file lists while every metadata mutation goes through the same
TableUpdate/TableRequirement protocol the reference implements.

Reference parity citations point into /root/reference (file:line).
"""

from .metadata import TableMetadataBuilder, assert_requirement, CommitError
from .store import (
    CatalogStore,
    ConflictError,
    NotFoundError,
    ValidationError,
    WarehouseNotEmptyError,
)

__all__ = [
    "TableMetadataBuilder",
    "assert_requirement",
    "CommitError",
    "CatalogStore",
    "ConflictError",
    "NotFoundError",
    "ValidationError",
    "WarehouseNotEmptyError",
]
