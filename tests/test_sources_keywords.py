"""JSONL source tolerance (doc_reader.py:147-222 semantics), TextRank /
frequency keyword kernels, lead-k summary."""

import json

import pytest

from news_information_retrieval_system_ray.functions.keywords import (
    frequency_keywords,
    textrank_keywords,
)
from news_information_retrieval_system_ray.functions.snippets import lead_k_summary


@pytest.fixture()
def jsonl_dir(tmp_path):
    f1 = tmp_path / "a.jsonl"
    rows = [
        {"title": "t1", "url": "u1", "content": "hello world"},
        {"title": "t2", "url": "u2", "content": ""},              # empty -> dropped
        {"title": "t3", "url": "u3", "body": "fallback body"},    # field fallback
        {"title": "t4", "url": "u4"},                              # no content -> dropped
    ]
    with open(f1, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows[:2]))
        fh.write("\n{not valid json]]\n")                          # corrupt -> skipped
        fh.write("\n".join(json.dumps(r) for r in rows[2:]) + "\n")
    f2 = tmp_path / "b.jsonl"
    with open(f2, "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"title": f"x{i}", "url": f"u{i}", "text": f"doc {i}"}) + "\n")
    return str(tmp_path)


def test_read_jsonl_tolerance_and_fallback(ray_session, jsonl_dir):
    from news_information_retrieval_system_ray.sources.readers import read_jsonl_docs

    rows = read_jsonl_docs(jsonl_dir + "/*.jsonl").take_all()
    texts = sorted(r["text"] for r in rows)
    assert "hello world" in texts and "fallback body" in texts
    assert len(rows) == 7  # 2 good from a.jsonl + 5 from b.jsonl


def test_read_jsonl_limit(ray_session, jsonl_dir):
    from news_information_retrieval_system_ray.sources.readers import read_jsonl_docs

    rows = read_jsonl_docs(jsonl_dir + "/b.jsonl", limit_per_file=2).take_all()
    assert len(rows) == 2


def test_textrank_central_term_wins():
    # "hub" co-occurs with everything; isolated pairs score lower
    toks = ["hub", "a", "hub", "b", "hub", "c", "hub", "d", "x", "y"]
    top = textrank_keywords(toks, k=3)
    assert top[0][0] == "hub"
    assert all(s > 0 for _, s in top)


def test_textrank_edges():
    assert textrank_keywords([], k=3) == []
    assert textrank_keywords(["solo"], k=3) == [("solo", 1.0)]
    out = textrank_keywords(["a", "b"], k=5)
    assert {t for t, _ in out} == {"a", "b"}


def test_textrank_deterministic():
    toks = list("abcabcabdbe")
    assert textrank_keywords(toks, k=4) == textrank_keywords(toks, k=4)


def test_textrank_scores_fixed_iters_sum_to_one():
    # tol=0 runs exactly max_iter power iterations; scores stay a
    # probability-ish vector (sum -> 1 as the chain mixes) and the
    # top-k ranking from the full vector matches textrank_keywords
    from news_information_retrieval_system_ray.functions.keywords import textrank_scores

    toks = ["hub", "a", "hub", "b", "hub", "c", "hub", "d", "x", "y"]
    scored = textrank_scores(toks, max_iter=30, tol=0.0)
    assert abs(sum(s for _, s in scored) - 1.0) < 1e-6
    again = textrank_scores(toks, max_iter=30, tol=0.0)
    assert scored == again
    # early-stop path (default tol) agrees with the converged fixed run
    conv = dict(textrank_scores(toks, max_iter=200, tol=0.0))
    dflt = dict(textrank_scores(toks))
    assert all(abs(conv[t] - dflt[t]) < 1e-4 for t in conv)


def test_frequency_keywords_tiebreak():
    assert frequency_keywords(["b", "a", "b", "a", "c"], k=2) == [("a", 2), ("b", 2)]


def test_lead_k_summary():
    text = "第一句。第二句！第三句？"
    assert lead_k_summary(text, 2) == "第一句。第二句"
    assert lead_k_summary("", 2) == ""
    assert lead_k_summary("no punctuation", 1) == "no punctuation"


def test_standardize_date_formats():
    from news_information_retrieval_system_ray.functions.dates import standardize_date

    assert standardize_date("2025-11-03") == "2025-11-03"
    assert standardize_date("2025/11/03") == "2025-11-03"
    assert standardize_date("03/11/2025") == "2025-11-03"
    assert standardize_date("2025年11月3日") == "2025-11-03"
    assert standardize_date("2025-11-03T10:22:33") == "2025-11-03"
    assert standardize_date("not a date") == ""
    assert standardize_date("") == ""


def test_jieba_mode_engines_registered():
    """jieba / jieba_search / jieba_nohmm are registered behind
    import-try (chinese_tokenizer.py:258-267 modes); absent package
    raises ImportError at factory time, not registration time."""
    from news_information_retrieval_system_ray.functions.tokenize import _ENGINES, get_tokenizer

    assert {"jieba", "jieba_search", "jieba_nohmm"} <= set(_ENGINES)
    try:
        import jieba  # noqa: F401
        has_jieba = True
    except ImportError:
        has_jieba = False
    if not has_jieba:
        import pytest

        for eng in ("jieba", "jieba_search", "jieba_nohmm"):
            with pytest.raises(ImportError):
                get_tokenizer(eng)


def test_custom_words_wrapper():
    """Custom dictionary words come out as whole tokens, longest first
    (the add_word surface, chinese_tokenizer.py:597-628), independent of
    the base engine."""
    from news_information_retrieval_system_ray.functions.tokenize import (
        get_tokenizer,
        with_custom_words,
    )

    base = get_tokenizer("cjk_bigram")
    tok = with_custom_words(base, ["圖書資訊學", "資訊學"])
    out = tok("我在學圖書資訊學和資訊學")
    assert "圖書資訊學" in out
    assert out.count("資訊學") == 1  # longest match wins at the overlap
    # words absent -> behaves exactly like the base engine
    assert with_custom_words(base, [])("abc def") == base("abc def")
