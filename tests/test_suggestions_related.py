"""search_suggestions / related_documents serving composites
(search_service.py:750-989)."""

import numpy as np
import pandas as pd
import pytest

from news_information_retrieval_system_ray.pipelines import analytics as A


@pytest.fixture()
def sugg_corpus(tmp_path):
    # vocab with a dist-1 pair (cart/card), a csoundex-similar pair
    # (cart/care: 3/4 positional = 0.75 >= 0.72) and filler terms
    texts = [
        "cart goes uphill with cargo",
        "card game night cart",
        "care for the care garden",
        "cold wind and cargo crates",
        "uphill garden crates game",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)),
                       "lang": ["en"] * len(texts),
                       "text": texts, "source": ["s"] * len(texts)})
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_suggestions_fuzzy_and_csoundex_branches(sugg_corpus):
    out = A.search_suggestions(sugg_corpus, terms=["cart"])
    by = {s: g.sort_values("rank")["term"].tolist()
          for s, g in out.groupby("stype")}
    # fuzzy: cart (dist 0) then dist-1 neighbors card/care -> differs
    assert by["fuzzy"][0] == "cart"
    assert "card" in by["fuzzy"] and "care" in by["fuzzy"]
    # csoundex: cart itself (1.0) first, then 0.75 matches
    assert by["csoundex"][0] == "cart"
    assert "card" in by["csoundex"]
    # rocchio expansion terms exclude the query term
    assert "rocchio" in by and "cart" not in by["rocchio"]
    assert "synonym" not in by


def test_suggestions_synonym_branch(sugg_corpus):
    # 'ai' is a vendored synonym-map key (text_quality.py pairs)
    out = A.search_suggestions(sugg_corpus, terms=["ai"])
    by = {s: g.sort_values("rank")["term"].tolist()
          for s, g in out.groupby("stype")}
    assert by["synonym"] == ["人工智慧"]


def test_suggestions_identity_expansions_omitted(sugg_corpus):
    # 'cold' has no dist-1 neighbors and no 0.72 csoundex matches other
    # than itself -> both branches collapse to the query itself and are
    # omitted (the reference's `!= terms` condition)
    out = A.search_suggestions(sugg_corpus, terms=["cold"])
    assert set(out["stype"]) <= {"rocchio"}


def test_related_documents_shape(tmp_path):
    # 12 docs, 3 sources; doc 0 shares terms with several others
    rows = []
    base = "alpha beta gamma delta epsilon"
    for i in range(12):
        extra = " ".join(f"w{i}x{j}" for j in range(6))
        rows.append((i, "en" if i % 2 == 0 else "de",
                     f"{base} {extra}", f"src{i % 3}"))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text", "source"])
    df.to_parquet(tmp_path / "documents.parquet")
    out = A.related_documents(str(tmp_path), doc_id=0, k=5)
    assert list(out["rank"]) == [1, 2, 3, 4, 5]
    assert 0 not in set(out["doc_id"])          # source doc excluded
    assert out["similarity"].iloc[0] == 1.0     # top doc normalizes to 1
    assert (out["similarity"] <= 1.0).all() and (out["similarity"] >= 0.0).all()
    # same_source docs (3, 6, 9) carry the +0.08+0.06 source+tag boost;
    # the top result shares doc 0's source group
    flags = dict(zip(out["doc_id"], out["same_source"]))
    for d, f in flags.items():
        assert f == (1 if d % 3 == 0 else 0)
