"""Dependency-tree SVO triple extraction (model-independent kernel).

The reference's syntax subsystem (src/ir/syntax/parser.py) couples a
SuPar biaffine parser MODEL (absent in this container — torch/supar are
not installed) with a model-independent TREE WALK that extracts
Subject-Verb-Object triples from dependency edges
(parser.py:420-511).  This module rebuilds the tree walk exactly; the
parser boundary is stubbed behind the same convention as
stages/multimodal.py (``parser="fake"`` = deterministic fake edges so
the Ray-side plumbing is real and tested; ``parser="supar"`` raises
NotImplementedError unless the library imports).

Extraction contract (parser.py:453-505):
- root verb = the edge with relation 'root' and head_index 0;
- subject  = first child of the root with relation in
  {nsubj, nsubjpass, top};
- object   = first child with relation in {dobj, attr, ccomp, iobj};
- emit (subject, verb, object) with confidence 1.0, or (subject, verb,
  None) with confidence 0.7 when ``include_partial``.
"""

from __future__ import annotations

from dataclasses import dataclass

SUBJECT_RELS = ("nsubj", "nsubjpass", "top")
OBJECT_RELS = ("dobj", "attr", "ccomp", "iobj")


@dataclass(frozen=True)
class DependencyEdge:
    """One dependency edge; indices are 1-based, head 0 = ROOT
    (parser.py:49-76)."""

    head_index: int
    dependent_index: int
    head_word: str
    dependent_word: str
    relation: str


@dataclass(frozen=True)
class SVOTriple:
    subject: str
    verb: str
    object: str | None
    confidence: float


def extract_svo(edges: list[DependencyEdge],
                include_partial: bool = True) -> list[SVOTriple]:
    """Tree walk of parser.py:450-511 over a parsed edge list."""
    if not edges:
        return []
    children: dict[int, list[DependencyEdge]] = {}
    for e in edges:
        children.setdefault(e.head_index, []).append(e)

    root = next((e for e in edges
                 if e.relation.lower() == "root" and e.head_index == 0), None)
    if root is None:
        return []
    kids = children.get(root.dependent_index, [])
    subject = next((e.dependent_word for e in kids
                    if e.relation in SUBJECT_RELS), None)
    obj = next((e.dependent_word for e in kids
                if e.relation in OBJECT_RELS), None)
    if subject is None:
        return []
    if obj is None and not include_partial:
        return []
    return [SVOTriple(subject, root.dependent_word, obj,
                      1.0 if obj is not None else 0.7)]


def fake_parse(tokens: list[str]) -> list[DependencyEdge]:
    """Deterministic stand-in for the SuPar parser: a fixed-shape tree
    (token 2 = root verb, token 1 = subject, token 3 = object when
    present, rest 'dep'), seeded only by the token list — stable for
    tests, same edge schema the real model would produce."""
    if len(tokens) < 2:
        return []
    edges = [DependencyEdge(0, 2, "ROOT", tokens[1], "root"),
             DependencyEdge(2, 1, tokens[1], tokens[0], "nsubj")]
    if len(tokens) >= 3:
        edges.append(DependencyEdge(2, 3, tokens[1], tokens[2], "dobj"))
    for i in range(3, len(tokens)):
        edges.append(DependencyEdge(2, i + 1, tokens[1], tokens[i], "dep"))
    return edges


class SVOStage:
    """Actor-pool map_batches stage: text -> SVO triples.

    The parser object is constructed ONCE per actor (``__init__``), the
    per-batch work is the parse + tree walk; pass to
    ``map_batches(SVOStage, concurrency=N)``.  ``parser='supar'``
    requires the real model (parser.py:151-215); absent here, so it
    raises NotImplementedError, exactly like the multimodal decoders.
    """

    def __init__(self, parser: str = "fake", text_col: str = "text",
                 include_partial: bool = True):
        self.text_col = text_col
        self.include_partial = include_partial
        if parser == "supar":
            try:  # pragma: no cover - lib absent in this container
                from supar import Parser  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "SuPar parser model not available in this container; "
                    "use parser='fake' for plumbing") from e
        self.parser = parser

    def __call__(self, t):
        import pyarrow as pa

        doc_ids, subs, verbs, objs, confs = [], [], [], [], []
        ids = t.column("doc_id").to_pylist()
        for doc_id, text in zip(ids, t.column(self.text_col).to_pylist()):
            toks = (text or "").split()
            for tr in extract_svo(fake_parse(toks), self.include_partial):
                doc_ids.append(doc_id)
                subs.append(tr.subject)
                verbs.append(tr.verb)
                objs.append(tr.object)
                confs.append(tr.confidence)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "subject": pa.array(subs, pa.string()),
                         "verb": pa.array(verbs, pa.string()),
                         "object": pa.array(objs, pa.string()),
                         "confidence": pa.array(confs, pa.float64())})
