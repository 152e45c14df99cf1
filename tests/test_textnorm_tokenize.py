"""Golden tests for the normalization chains and tokenizers (the
byte-identical invariants of SURVEY §2.2 / FIXTURES §3)."""

from news_information_retrieval_system_ray.functions.textnorm import (
    clean_text,
    extract_text_from_html,
    keep_token,
    normalize_text,
)
from news_information_retrieval_system_ray.functions.tokenize import get_tokenizer, tokenize


def test_clean_text_collapses_whitespace():
    assert clean_text("  a\t\tb\n\nc  ") == "a b c"
    assert clean_text("") == ""
    assert clean_text("\n \t") == ""


def test_normalize_text_chain():
    # NFKC (fullwidth -> ascii), 臺->台, lower, ws collapse, strip
    assert normalize_text("ＡＩ　技術") == "ai 技術"
    assert normalize_text("臺灣  Tech\nNews") == "台灣 tech news"
    assert normalize_text("") == ""


def test_extract_text_from_html_paragraph_join():
    html = (
        "<html><head><title>T</title></head><body><h1>T</h1>"
        "<div class='nav'>導覽列</div>"
        "<p>第一段  內容。</p><p> second <b>para</b> </p><p></p>"
        "<div class='footer'>footer junk</div></body></html>"
    )
    assert extract_text_from_html(html) == "第一段 內容。 second para"


def test_keep_token_filter():
    assert keep_token("abc")
    assert keep_token("台")
    assert keep_token("a1_")
    assert not keep_token("。")
    assert not keep_token("---")


def test_whitespace_tokenizer():
    toks = tokenize("The  Fast-Key ORDER", engine="whitespace")
    # normalize first: lower + collapse; split on spaces; "fast-key" kept (has word chars)
    assert toks == ["the", "fast-key", "order"]


def test_cjk_bigram_tokenizer():
    toks = tokenize("台灣經濟 AI 發展", engine="cjk_bigram")
    assert toks == ["台灣", "灣經", "經濟", "ai", "發展"]
    assert tokenize("台", engine="cjk_bigram") == ["台"]
    assert tokenize("", engine="cjk_bigram") == []


def test_mixed_cjk_english():
    toks = tokenize("蘇澳abc淹水", engine="cjk_bigram")
    assert toks == ["蘇澳", "abc", "淹水"]


def test_tokenizers_deterministic():
    tok = get_tokenizer("cjk_bigram")
    s = normalize_text("颱風鳳凰影響 台灣 economy-2024")
    assert tok(s) == tok(s)


def test_corpus_audit_hist_stats():
    import numpy as np

    from news_information_retrieval_system_ray.pipelines.analytics import (
        _hist_stats,
    )

    # odd n: exact middle; even n: average of the two middles
    v = np.array([5, 1, 3]); c = np.array([1, 2, 2])  # values 1,1,3,3,5
    mn, mx, mean, med = _hist_stats(v, c)
    assert (mn, mx) == (1.0, 5.0)
    assert mean == (1 + 1 + 3 + 3 + 5) / 5
    assert med == 3.0
    v = np.array([10, 2]); c = np.array([1, 3])  # 2,2,2,10
    assert _hist_stats(v, c)[3] == 2.0
    v = np.array([4, 2]); c = np.array([2, 2])  # 2,2,4,4
    assert _hist_stats(v, c)[3] == 3.0


def test_corpus_audit_pipeline(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from news_information_retrieval_system_ray.pipelines import analytics as A

    out = A.corpus_audit(sf_dir).iloc[0]
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert out["total_documents"] == n
    assert 0 <= out["duplicate_hashes"] < n
    assert out["chars_min"] <= out["chars_median"] <= out["chars_max"]
    assert out["tokens_min"] <= out["tokens_median"] <= out["tokens_max"]


def test_sum_by_bucketed_matches_single_partition(ray_session, sf_dir):
    """The web-scale hash-bucketed finish must agree with the default
    single-partition merge exactly."""
    from news_information_retrieval_system_ray.pipelines import analytics as A

    ex = A._exploded_ds(sf_dir)
    a = (A._sum_by(ex, ("term",), ("tf",), counts=("df",)).to_pandas()
         .sort_values("term").reset_index(drop=True))
    b = (A._sum_by(ex, ("term",), ("tf",), counts=("df",), num_buckets=8)
         .to_pandas().sort_values("term").reset_index(drop=True))
    assert list(a.columns) == ["term", "tf", "df"]
    assert set(b.columns) == {"term", "tf", "df"}
    b = b[["term", "tf", "df"]]
    assert a.equals(b)


def test_sum_by_property_random_frames(ray_session):
    """_sum_by (both finish paths) == pandas groupby-sum on random frames."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from news_information_retrieval_system_ray.pipelines import analytics as A

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3),
                              st.floats(-10, 10, allow_nan=False)),
                    min_size=1, max_size=200),
           st.integers(1, 4))
    def check(rows, buckets):
        df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
        expect = (df.assign(c=1).groupby(["k1", "k2"], as_index=False)
                    [["v", "c"]].sum()
                    .sort_values(["k1", "k2"]).reset_index(drop=True))
        ds = rd.from_pandas(df).repartition(3)
        got = (A._sum_by(ds, ("k1", "k2"), ("v",), counts=("c",),
                         num_buckets=buckets).to_pandas()
               [["k1", "k2", "v", "c"]]
               .sort_values(["k1", "k2"]).reset_index(drop=True))
        assert got["k1"].tolist() == expect["k1"].tolist()
        assert got["k2"].tolist() == expect["k2"].tolist()
        assert got["c"].tolist() == expect["c"].tolist()
        assert np.allclose(got["v"], expect["v"], atol=1e-9)

    check()


def test_sum_by_auto_buckets_engage_above_threshold(ray_session):
    """VERDICT r3 #1: the default (auto) finish must hash-bucket when
    the partials exceed the per-task threshold — no call site silently
    keeps the whole key domain in one task — and stay on the cheap
    single merge below it, with identical results either way."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from news_information_retrieval_system_ray.pipelines import analytics as A

    df = pd.DataFrame({
        "k": np.arange(600) % 37,
        "v": np.arange(600, dtype=np.float64),
    })
    expect = (df.assign(c=1).groupby("k", as_index=False)[["v", "c"]].sum()
                .sort_values("k").reset_index(drop=True))
    ds = rd.from_pandas(df).repartition(4)

    # below threshold: auto picks the single-partition merge
    got1 = (A._sum_by(ds, ("k",), ("v",), counts=("c",)).to_pandas()
            .sort_values("k").reset_index(drop=True))
    assert A._SUM_BY_LAST_BUCKETS == 1

    # tiny threshold: auto must engage the bucketed finish
    got2 = (A._sum_by(ds, ("k",), ("v",), counts=("c",), rows_per_bucket=10)
            .to_pandas()[["k", "v", "c"]]
            .sort_values("k").reset_index(drop=True))
    assert A._SUM_BY_LAST_BUCKETS > 1

    for got in (got1, got2):
        assert got["k"].tolist() == expect["k"].tolist()
        assert got["c"].tolist() == expect["c"].tolist()
        assert np.allclose(got["v"], expect["v"], atol=1e-9)


def test_ws_collapse_equivalence():
    """clean_text's split/join form must equal the reference regex form:
    str.split()'s whitespace set == re \\s over every Unicode codepoint,
    and the collapse+strip outputs match on adversarial samples."""
    import re

    ws = re.compile(r"\s+")
    mismatch = [cp for cp in range(0x110000)
                if bool(ws.match(chr(cp))) != chr(cp).isspace()]
    assert mismatch == []
    from news_information_retrieval_system_ray.functions.textnorm import clean_text
    samples = ["", "  ", "a", " a  b\tc\nd　e f ", "\x85x\x1c y",
               "多  空格 行", "\v\f mixed \r\n"]
    for s in samples:
        assert clean_text(s) == ws.sub(" ", s).strip()
