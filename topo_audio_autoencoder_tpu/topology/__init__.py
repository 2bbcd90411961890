"""Topology core: combinatorial tables, closure rectifier, operator builder."""

from .complexes import ComplexTables, build_tables, RANK_NAMES, MAX_RANK
from .rectifier import (
    RectifiedProbs,
    enforce_constraints,
    enforce_constraints_flat,
    constraint_violations,
)
from .builder import (
    SimplicialOperators,
    build_operators,
    same_rank_matmul,
    dense_adjacency,
)
from .packed import PackedOperators, build_packed_operators

__all__ = [
    "PackedOperators",
    "build_packed_operators",
    "ComplexTables",
    "build_tables",
    "RANK_NAMES",
    "MAX_RANK",
    "RectifiedProbs",
    "enforce_constraints",
    "enforce_constraints_flat",
    "constraint_violations",
    "SimplicialOperators",
    "build_operators",
    "same_rank_matmul",
    "dense_adjacency",
]
