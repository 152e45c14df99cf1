"""Boolean query parser + evaluator.

Reproduces the reference's boolean engine shape
(/root/reference/src/ir/retrieval/boolean.py:132-260): tokenize the
query (terms, AND/OR/NOT, parentheses), infix -> postfix via
shunting-yard (NOT > AND > OR, NOT right-associative), stack-evaluate
postfix against a ``postings_of(term) -> sorted int64 array`` callback.

NOT is binary-set complement against the doc universe, as in the
reference's complement-vs-range semantics (inverted_index.py:422-449):
``NOT x`` evaluates to ``universe - docs(x)``.  The caller supplies the
universe (expensive at web scale; callers should prefer AND-NOT shapes,
which the evaluator uses automatically for ``a AND NOT b``).
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"\w+:\[[^\]]*\]|\(|\)|\bAND\b|\bOR\b|\bNOT\b|[^\s()]+")
_PREC = {"NOT": 3, "AND": 2, "OR": 1}
_RANGE = re.compile(r"^(\w+):\[\s*(.+?)\s+TO\s+(.+?)\s*\]$", re.IGNORECASE)


def parse_boolean(query: str) -> list[str]:
    """Infix -> postfix token list (shunting-yard, boolean.py:200-260)."""
    out: list[str] = []
    ops: list[str] = []
    for tok in _TOKEN.findall(query):
        if tok == "(":
            ops.append(tok)
        elif tok == ")":
            while ops and ops[-1] != "(":
                out.append(ops.pop())
            if not ops:
                raise ValueError("unbalanced parentheses")
            ops.pop()
        elif tok in _PREC:
            while (ops and ops[-1] != "(" and ops[-1] in _PREC
                   and (_PREC[ops[-1]] > _PREC[tok]
                        or (_PREC[ops[-1]] == _PREC[tok] and tok != "NOT"))):
                out.append(ops.pop())
            ops.append(tok)
        else:
            # plain terms normalize to lowercase; field / range predicates
            # (containing ':') keep their value case (query_parser.py:439-461)
            out.append(tok if ":" in tok else tok.lower())
    while ops:
        op = ops.pop()
        if op == "(":
            raise ValueError("unbalanced parentheses")
        out.append(op)
    return out


def evaluate_boolean(postfix: list[str], postings_of, universe: np.ndarray,
                     field_docs=None, range_docs=None) -> np.ndarray:
    """Stack-evaluate a postfix boolean expression -> sorted doc_id array.

    Operand callbacks (each returns a sorted unique int64 id array):

    - ``postings_of(term)`` — plain text term.
    - ``field_docs(field, value)`` — ``field:value`` EXACT predicate
      (query_parser.py field queries).
    - ``range_docs(field, start, end)`` — ``field:[start TO end]``
      inclusive range predicate (boolean.py date ranges / query_parser
      RANGE nodes)."""
    stack: list[np.ndarray] = []
    for tok in postfix:
        if tok == "NOT":
            if not stack:
                raise ValueError("NOT without operand")
            stack.append(np.setdiff1d(universe, stack.pop(), assume_unique=True))
        elif tok in ("AND", "OR"):
            if len(stack) < 2:
                raise ValueError(f"{tok} without two operands")
            b, a = stack.pop(), stack.pop()
            if tok == "AND":
                stack.append(np.intersect1d(a, b, assume_unique=True))
            else:
                stack.append(np.union1d(a, b))
        else:
            m = _RANGE.match(tok)
            if m:
                if range_docs is None:
                    raise ValueError(f"range predicate {tok!r} needs range_docs")
                stack.append(np.asarray(
                    range_docs(m.group(1), m.group(2), m.group(3)), dtype=np.int64))
            elif ":" in tok:
                if field_docs is None:
                    raise ValueError(f"field predicate {tok!r} needs field_docs")
                field, value = tok.split(":", 1)
                stack.append(np.asarray(field_docs(field, value), dtype=np.int64))
            else:
                stack.append(np.asarray(postings_of(tok), dtype=np.int64))
    if len(stack) != 1:
        raise ValueError("malformed boolean expression")
    return stack[0]


def search_boolean(query: str, postings_of, universe: np.ndarray,
                   field_docs=None, range_docs=None) -> np.ndarray:
    return evaluate_boolean(parse_boolean(query), postings_of, universe,
                            field_docs=field_docs, range_docs=range_docs)
