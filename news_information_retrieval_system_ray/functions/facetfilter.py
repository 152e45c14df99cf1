"""Composable facet filter conditions (the reference's FacetFilter).

Reference parity: ``src/ir/facet/facet_filter.py`` — ``FilterOperator``
(equals / in / range / gt / lt / gte / lte / contains / starts_with,
:20-31), ``FilterCondition.matches`` (:64-160: missing field -> False;
string-normalized EQUALS / IN / RANGE with lexicographic ISO-date
semantics; numeric-preferred comparisons falling back to string order;
substring CONTAINS; prefix STARTS_WITH), ``FacetFilter.filter``
(:350-411: AND across conditions, OR within a field via IN), and the
``create_term_filter`` / ``create_date_range_filter`` /
``create_numeric_range_filter`` helpers (:486-566).

Distributed shape: conditions are tiny driver objects; application is
a per-batch boolean mask inside ``map_batches`` (``apply_facet_filter``
in pipelines/analytics) — the Dataset streams, only survivors leave
each task, nothing materializes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

OPERATORS = {"equals", "in", "range", "gt", "lt", "gte", "lte",
             "contains", "starts_with"}


@dataclass
class FilterCondition:
    """One facet predicate (facet_filter.py:34-204)."""

    field: str
    operator: str
    value: Any
    label: str | None = None

    def __post_init__(self) -> None:
        if self.operator not in OPERATORS:
            raise ValueError(f"unknown operator {self.operator!r}")

    def matches(self, doc_value: Any) -> bool:
        """facet_filter.py:64-160 semantics, branch for branch."""
        if doc_value is None:
            return False
        s = str(doc_value)
        op, v = self.operator, self.value
        if op == "equals":
            return s == str(v)
        if op == "in":
            vals = v if isinstance(v, (list, set)) else [v]
            svals = [str(x) for x in vals]
            if isinstance(doc_value, list):
                return any(str(x) in svals for x in doc_value)
            return s in svals
        if op == "range":
            if not isinstance(v, tuple) or len(v) != 2:
                return False
            lo, hi = v
            return str(lo) <= s <= str(hi)
        if op in ("gt", "lt", "gte", "lte"):
            try:
                a, b = float(doc_value), float(v)
            except (ValueError, TypeError):
                a, b = s, str(v)
            return {"gt": a > b, "lt": a < b,
                    "gte": a >= b, "lte": a <= b}[op]
        if op == "contains":
            return str(v) in s
        if op == "starts_with":
            return s.startswith(str(v))
        return False


def range_filter(field: str, min_value: Any, max_value: Any,
                 label: str | None = None) -> FilterCondition:
    """RangeFilter / create_date_range_filter (facet_filter.py:206-249,
    515-538): lexicographic (min, max) inclusive range."""
    return FilterCondition(field, "range", (min_value, max_value), label)


def term_filter(field: str, values: Any,
                label: str | None = None) -> FilterCondition:
    """create_term_filter (facet_filter.py:486-513): EQUALS for a
    single value, IN for a list."""
    if isinstance(values, list):
        return FilterCondition(field, "in", values, label)
    return FilterCondition(field, "equals", values, label)


class FacetFilter:
    """AND-combined condition set (facet_filter.py:251-458)."""

    def __init__(self) -> None:
        self.conditions: list[FilterCondition] = []

    def add_condition(self, cond: FilterCondition) -> "FacetFilter":
        self.conditions.append(cond)
        return self

    def remove_condition(self, field: str, operator: str | None = None) -> None:
        self.conditions = [c for c in self.conditions
                           if not (c.field == field
                                   and (operator is None or c.operator == operator))]

    def clear(self) -> None:
        self.conditions = []

    def matches_row(self, row: dict[str, Any]) -> bool:
        return all(c.matches(row.get(c.field)) for c in self.conditions)

    def filter(self, documents: list[dict]) -> list[dict]:
        if not self.conditions:
            return documents
        return [d for d in documents if self.matches_row(d)]

    def has_filter(self, field: str) -> bool:
        return any(c.field == field for c in self.conditions)

    def get_filter_count(self) -> int:
        return len(self.conditions)
