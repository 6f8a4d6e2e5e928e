"""Temporal range predicates (Allen's interval algebra).

Reference: ``temporal/*.java`` — 24 classes over ``TemporalRange`` [from,to]
pairs (e.g. ``After.java:12-19``: range1.from.after(range2.to)).  Here each
predicate is a pure-Catalyst column expression over two
``struct<from:timestamp,to:timestamp>`` (or plain column pair) ranges —
whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column


def t_after(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    """A strictly after B (reference After.java: a.from > b.to)."""
    return a_from > b_to


def t_before(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return a_to < b_from


def t_meets(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return a_to == b_from


def t_met_by(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return a_from == b_to


def t_overlaps(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    """A starts before B, they overlap, A ends inside B."""
    return (a_from < b_from) & (a_to > b_from) & (a_to < b_to)


def t_overlapped_by(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return t_overlaps(b_from, b_to, a_from, a_to)


def t_during(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return (a_from > b_from) & (a_to < b_to)


def t_contains(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return t_during(b_from, b_to, a_from, a_to)


def t_starts(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return (a_from == b_from) & (a_to < b_to)


def t_started_by(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return t_starts(b_from, b_to, a_from, a_to)


def t_finishes(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return (a_to == b_to) & (a_from > b_from)


def t_finished_by(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return t_finishes(b_from, b_to, a_from, a_to)


def t_equals(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    return (a_from == b_from) & (a_to == b_to)


def t_intersects(a_from: Column, a_to: Column, b_from: Column, b_to: Column) -> Column:
    """Periods share at least one instant (PeriodIntersect/PeriodOverlaps)."""
    return (a_from <= b_to) & (b_from <= a_to)


ALLEN_RELATIONS = {
    "after": t_after,
    "before": t_before,
    "meets": t_meets,
    "met_by": t_met_by,
    "overlaps": t_overlaps,
    "overlapped_by": t_overlapped_by,
    "during": t_during,
    "contains": t_contains,
    "starts": t_starts,
    "started_by": t_started_by,
    "finishes": t_finishes,
    "finished_by": t_finished_by,
    "equals": t_equals,
}
