"""Golden tests for the reference pipelines Q1-Q7 over the hand-built
tweet fixture (conftest.TWEETS). Expected values derived by hand —
see SURVEY.md §2.11 for the reference composition each mirrors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tvbigdataproject_spark.plans import TweetGraphPipeline


@pytest.fixture(scope="module")
def pipe(spark, tweets_df):
    return TweetGraphPipeline(spark, tweets=tweets_df)


def rows(df, *cols):
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_q1_retweet_edges(pipe):
    # (original author → retweeter, count); u2 retweeted u1 twice,
    # u4→u3 once, u5 self-retweet, u6 quoted u1 once.
    assert rows(pipe.retweet_edges(), "src", "dst", "w") == [
        ("1", "2", 2.0),
        ("1", "6", 1.0),
        ("3", "4", 1.0),
        ("5", "5", 1.0),
    ]


def test_q2_user_hashtags_normalization(pipe):
    # Café/CAFE/cafe fold to 'cafe'; Ümlaut → 'umlaut'; u2 gains tags via
    # the posts it retweeted; u4 merges own 'spark' with retweeted
    # {alpha,beta}; u5 (tagless) absent; arrays sorted+deduped.
    got = {r["id"]: r["hts"] for r in pipe.user_hashtags().collect()}
    assert got == {
        "1": ["cafe", "spark"],
        "2": ["cafe", "spark"],
        "3": ["alpha", "beta", "cafe", "delta", "gamma", "spark"],
        "4": ["alpha", "beta", "spark"],
        "6": ["omega", "umlaut"],
    }


def test_q2_flag_only_tags_from_not_retweeted_posts(spark, tweets_df):
    # With the flag (reference P4, RetweetTagsJaccardGraph.py:100-102),
    # u6's own tag on its quote-tweet ('omega') is excluded.
    pipe = TweetGraphPipeline(
        spark, tweets=tweets_df, only_tags_from_not_retweeted_posts=True
    )
    got = {r["id"]: r["hts"] for r in pipe.user_hashtags().collect()}
    assert got["6"] == ["umlaut"]
    assert got["1"] == ["cafe", "spark"]  # unaffected


def test_q2_hashtag_edges(pipe):
    edges = rows(pipe.hashtag_edges(), "src", "dst", "w")
    # exploded from the deduped per-user set → weight 1 each, one row per
    # (user, tag)
    assert ("1", "cafe", 1.0) in edges
    assert ("6", "umlaut", 1.0) in edges
    assert len(edges) == 2 + 2 + 6 + 3 + 2
    assert all(w == 1.0 for _, _, w in edges)


def test_q3_jaccard_edges(pipe):
    # candidates (≥2 shared tags): (1,2) j=1.0, (1,3) j=1/3, (2,3) j=1/3,
    # (3,4) j=0.5; threshold is strict > 0.5 (reference
    # RetweetTagsJaccardGraph.py:183) → only (1,2) survives.
    assert rows(pipe.jaccard_edges(), "src", "dst", "w", "type") == [
        ("1", "2", 1.0, "JC"),
    ]


def test_q4_full_graph(pipe):
    g = pipe.full_graph()
    edges = rows(g.edges, "src", "dst", "type")
    assert ("1", "2", "RT") in edges
    assert ("1", "2", "JC") in edges
    assert ("3", "delta", "HT") in edges
    # vertices = users ∪ tags incident to any edge
    ids = {r["id"] for r in g.vertices.collect()}
    assert {"1", "2", "3", "4", "5", "6", "cafe", "spark", "umlaut"} <= ids
    # edge count: 4 RT + 15 HT + 1 JC
    assert g.edges.count() == 20


def test_q5_bi_report(pipe):
    rep = {r["user"]: r for r in pipe.bi_report().collect()}
    u1 = rep["1"]
    assert u1["hashtags"] == "[cafe,spark]"
    assert u1["retweeted_users"] == "[2,6]"  # users who retweeted u1
    assert u1["retweeting_users"] == "[]"  # u1 retweeted nobody
    assert u1["jaccard_users"] == "[2]"
    u4 = rep["4"]
    assert u4["retweeting_users"] == "[3]"  # u4 retweeted u3
    assert u4["jaccard_users"] == "[]"
    # u5 has no tags → not in the mapping-driven report (reference
    # starts from user_hts_mapping, RetweetTagsJaccardGraph.py:207)
    assert "5" not in rep


def test_q6_word_cloud_corpus(pipe):
    texts = sorted(r["text"] for r in pipe.word_cloud_corpus().collect())
    # retweets prefer the retweeted post's text; nulls drop; cleaning
    # lowercases and strips punctuation
    assert "spark is great" in texts
    assert "alpha beta" in texts  # 'alpha beta!' cleaned
    assert all(t == t.lower() for t in texts)
    # 10 tweets - 1 null-text (T9) - 1 quote-with-null-rt-text?  T10 rt
    # text is null → falls back? reference P5 keeps rt.text when rt.text
    # is NOT null; T10 rt.text None → uses own 'quoting'
    assert "quoting" in texts
    assert len(texts) == 9


def test_q7_neighborhood(pipe):
    g = pipe.neighborhood("1", hops=2)
    ids = {r["id"] for r in g.vertices.collect()}
    # hop-1 (dst-only, non-HT): {2, 6}; subgraph = edges incident to
    # {1,2,6} incl. their HT edges
    assert ids == {"1", "2", "6", "cafe", "spark", "omega", "umlaut"}
    assert g.edges.count() == 9


def test_q7_quirk_flags(pipe):
    # disabling the reference quirks: follow both directions, allow HT
    # hops → tags join the frontier
    from tvbigdataproject_spark.operators.graph import k_hop_neighborhood

    g = k_hop_neighborhood(
        pipe.full_graph().edges,
        "3",
        hops=2,
        follow_dst_only=False,
        exclude_types_from_hop=(),
    )
    ids = {r["id"] for r in g.vertices.collect()}
    # u3's tags are in the frontier now, and u4 (retweeter of 3) too
    assert "alpha" in ids and "4" in ids
