"""Web-corpus curation operators: repetition signals, paragraph-level
corpus dedup, URL canonicalization, PII scrub, contamination check.

Semantics pinned against the published Gopher/C4/CCNet recipe shapes;
plan-shape tests assert the documented scale contracts (repetition is
shuffle-free; the contamination probe broadcasts the benchmark side).
"""

import pyspark.sql.functions as F
import pytest

from tika_spark.analysis.curation import (canonical_url,
                                          contamination_check,
                                          host_rollup, normalize_text,
                                          paragraph_dedup, pii_scrub,
                                          repetition_features,
                                          snapshot_delta_dedup,
                                          url_host)
from tika_spark.analysis.textstats import fingerprint


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(0, "a b\nc d\na b\n\nx y x y x y"),
         (1, "solo line"),
         (2, "a b\nzz")],
        "doc_id long, text string")


class TestRepetition:
    def test_features(self, spark, docs):
        r = {x["doc_id"]: x for x in
             repetition_features(docs).collect()}
        assert r[0]["n_lines"] == 4 and r[0]["n_uniq_lines"] == 3
        # "a b" twice -> 6 duplicated chars
        assert r[0]["dup_line_chars"] == 6
        # grams: "x y" x3, "y x" x2, ...
        assert r[0]["top_2gram"] == "x y"
        assert r[0]["top_2gram_n"] == 3
        assert r[0]["top_2gram_chars"] == 9
        assert r[1]["dup_line_chars"] == 0
        assert r[1]["top_2gram"] == "solo line"

    def test_tie_breaks_to_smallest_gram(self, spark):
        df = spark.createDataFrame([(0, "b c b c a a a b")],
                                   "doc_id long, text string")
        row = repetition_features(df).first()
        # "b c" x2, "a a" x2 -> smallest gram wins
        assert row["top_2gram"] == "a a" and row["top_2gram_n"] == 2

    def test_shuffle_free_plan(self, spark, docs):
        plan = repetition_features(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestParagraphDedup:
    def test_shared_paragraphs_dropped(self, spark, docs):
        r = {x["doc_id"]: x for x in paragraph_dedup(docs).collect()}
        # "a b" occurs in docs 0 and 2 -> dropped everywhere
        assert r[0]["text_clean"] == "c d\nx y x y x y"
        assert r[0]["n_paras"] == 4 and r[0]["n_shared"] == 2
        assert r[2]["text_clean"] == "zz" and r[2]["n_shared"] == 1
        assert r[1]["text_clean"] == "solo line"

    def test_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(0, "z last\nm mid\na first"), (1, "unrelated")],
            "doc_id long, text string")
        r = paragraph_dedup(df).filter("doc_id = 0").first()
        assert r["text_clean"] == "z last\nm mid\na first"

    def test_all_shared_yields_empty(self, spark):
        df = spark.createDataFrame([(0, "same"), (1, "same")],
                                   "doc_id long, text string")
        for row in paragraph_dedup(df).collect():
            assert row["text_clean"] == "" and row["n_shared"] == 1


class TestUrls:
    CASES = [
        ("HTTP://WWW.Ex.COM:80/Path?utm_source=a&id=5&utm_x=b#f",
         "http://www.ex.com/Path?id=5", "www.ex.com"),
        ("https://Site.ORG:443/", "https://site.org/", "site.org"),
        ("https://h.net/p?a=1&fbclid=zz", "https://h.net/p?a=1",
         "h.net"),
        ("http://plain.com:8080/x?gclid=1", "http://plain.com:8080/x",
         "plain.com"),
        ("https://a.b/p?utm_only=1", "https://a.b/p", "a.b"),
    ]

    def test_canonicalization(self, spark):
        df = spark.createDataFrame([(u,) for u, _, _ in self.CASES],
                                   "url string")
        got = df.select(
            canonical_url(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h")).collect()
        for (u, want_c, want_h), row in zip(self.CASES, got):
            assert row["c"] == want_c, u
            assert row["h"] == want_h, u

    def test_host_rollup(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/1", 10), ("https://A.COM:443/2", 20),
             ("http://b.org/", 5)], "url string, n_chars long")
        r = {x["host"]: x for x in host_rollup(df).collect()}
        assert r["a.com"]["n_docs"] == 2
        assert r["a.com"]["total_chars"] == 30
        assert r["b.org"]["n_docs"] == 1


class TestPii:
    def test_scrub_and_count(self, spark):
        df = spark.createDataFrame(
            [(0, "write a.b-c%d@mail.example.org or ping 10.0.255.7"),
             (1, "version 1.2.3.4000 is not an ip, nor x@y")],
            "doc_id long, text string")
        r = {x["doc_id"]: x for x in pii_scrub(df).collect()}
        assert r[0]["text_scrubbed"] == "write <EMAIL> or ping <IP>"
        assert r[0]["n_emails"] == 1 and r[0]["n_ipv4"] == 1
        # 1.2.3.4000 has no digit boundary; x@y has no dotted TLD
        assert r[1]["n_emails"] == 0 and r[1]["n_ipv4"] == 0
        assert r[1]["text_scrubbed"] == r[1]["text"] if hasattr(
            r[1], "text") else True


class TestContamination:
    def test_counts(self, spark):
        bench = spark.createDataFrame(
            [(100, "one two three four five")],
            "doc_id long, text string")
        docs = spark.createDataFrame(
            [(0, "one two three four nine"),
             (1, "no overlap here at all")],
            "doc_id long, text string")
        r = {x["doc_id"]: x for x in
             contamination_check(docs, bench, k=3).collect()}
        # doc0 3-grams: {one two three, two three four, three four nine}
        assert r[0]["n_grams"] == 3 and r[0]["n_hit"] == 2
        assert r[1]["n_grams"] == 3 and r[1]["n_hit"] == 0

    def test_broadcast_plan(self, spark):
        bench = spark.createDataFrame([(100, "a b c d")],
                                      "doc_id long, text string")
        docs = spark.createDataFrame([(0, "a b c e")],
                                     "doc_id long, text string")
        plan = contamination_check(docs, bench)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" \
            in plan


class TestSnapshotDelta:
    def test_delta_semantics(self, spark):
        old = spark.createDataFrame(
            [(0, "seen before"), (2, "also seen")],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(10, "seen before"),      # dup of prior corpus -> dropped
             (11, "brand new"),
             (12, "brand new"),        # in-snapshot dup -> lowest id wins
             (13, "another fresh")],
            "doc_id long, text string")
        seen = fingerprint(old).select("fp_64", "fp_md5")
        got = sorted(r["doc_id"] for r in
                     snapshot_delta_dedup(new, seen).collect())
        assert got == [11, 13]

    def test_join_carries_fingerprints_only(self, spark):
        old = spark.createDataFrame([(0, "a")], "doc_id long, text string")
        new = spark.createDataFrame([(1, "b")], "doc_id long, text string")
        seen = fingerprint(old).select("fp_64", "fp_md5")
        plan = snapshot_delta_dedup(new, seen)._jdf \
            .queryExecution().executedPlan().toString()
        # the anti-join is on fingerprint columns, never the text
        assert "LeftAnti" in plan


class TestNormalizeText:
    def test_normalization_chain(self, spark):
        df = spark.createDataFrame(
            [(0, "  Héllo\r\n\r\n\r\n\r\nwor\x07ld\t\tnow  "),
             (1, None),
             (2, "plain ascii text")],
            "doc_id long, text string")
        r = {x["doc_id"]: x["text_norm"]
             for x in normalize_text(df).collect()}
        # NFD e+acute composes to é; CRLF runs collapse to one blank
        # line; BEL stripped; tab run -> one space; outer trim
        assert r[0] == "Héllo\n\nwor ld now".replace("wor ld",
                                                          "world")
        assert r[1] is None
        assert r[2] == "plain ascii text"

    def test_spaces_around_newlines(self, spark):
        df = spark.createDataFrame([(0, "a \n b\n  c")],
                                   "doc_id long, text string")
        assert normalize_text(df).first()["text_norm"] == "a\nb\nc"


class TestDsir:
    def test_target_like_docs_score_higher(self, spark):
        target = spark.createDataFrame(
            [(100 + i, "science research method experiment data")
             for i in range(5)],
            "doc_id long, text string")
        raw = spark.createDataFrame(
            [(0, "science research method experiment data"),
             (1, "science research and some other words"),
             (2, "buy cheap pills online casino bonus now")],
            "doc_id long, text string")
        from tika_spark.analysis.curation import dsir_scores
        r = {x["doc_id"]: x["dsir_micro"]
             for x in dsir_scores(raw, target).collect()}
        # exact target text > partial overlap > no overlap
        assert r[0] > r[1] > r[2]

    def test_broadcast_ratio_plan(self, spark):
        df = spark.createDataFrame([(0, "a b c")],
                                   "doc_id long, text string")
        from tika_spark.analysis.curation import dsir_scores
        plan = dsir_scores(df, df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestPackSequences:
    """Greedy next-fit packing into fixed-token training chunks."""

    def test_next_fit(self, spark):
        from tika_spark.analysis.curation import pack_sequences
        df = spark.createDataFrame(
            [("s1", 1, "a b c"), ("s1", 2, "d e f g"),
             ("s1", 3, "h i"), ("s1", 4, " ".join(["w"] * 12)),
             ("s2", 5, "x"), ("s2", 6, "y z")],
            "source string, doc_id long, text string")
        out = {r["doc_id"]: r for r in
               pack_sequences(df, budget=8).collect()}
        # s1: 3+4=7 fits; 2 overflows -> chunk 2; 12 > budget -> own chunk
        assert [out[i]["chunk"] for i in (1, 2, 3, 4)] == [1, 1, 2, 3]
        # groups pack independently
        assert [out[i]["chunk"] for i in (5, 6)] == [1, 1]
        assert out[4]["n_tok"] == 12

    def test_oversized_doc_alone(self, spark):
        from tika_spark.analysis.curation import pack_sequences
        df = spark.createDataFrame(
            [("s", 1, " ".join(["w"] * 100)),
             ("s", 2, "a b"), ("s", 3, " ".join(["v"] * 99))],
            "source string, doc_id long, text string")
        out = {r["doc_id"]: r["chunk"] for r in
               pack_sequences(df, budget=10).collect()}
        assert out == {1: 1, 2: 2, 3: 3}

    def test_string_doc_id_and_long_group(self, spark):
        # regression (round-3 advice): the applyInPandas schema was
        # hardcoded 'grp string, id long' — any corpus with a string
        # doc_id or non-string group failed at runtime
        from tika_spark.analysis.curation import pack_sequences
        df = spark.createDataFrame(
            [(7, "a", "x y z"), (7, "b", "p q r s"), (7, "c", "m n")],
            "source long, doc_id string, text string")
        out = {r["doc_id"]: r["chunk"] for r in
               pack_sequences(df, budget=8).collect()}
        assert out == {"a": 1, "b": 1, "c": 2}

    def test_partitioning_invariant(self, spark):
        """Chunk ids depend on (group, doc_id) order only, not on the
        physical layout the rows arrive in."""
        from tika_spark.analysis.curation import pack_sequences
        rows = [("g%d" % (i % 3), i, " ".join(["t"] * (1 + i % 7)))
                for i in range(60)]
        df1 = spark.createDataFrame(
            rows, "source string, doc_id long, text string")
        df2 = df1.repartition(7, "doc_id")
        a = sorted(map(tuple, pack_sequences(df1, budget=12).collect()))
        b = sorted(map(tuple, pack_sequences(df2, budget=12).collect()))
        assert a == b


class TestSubstringDedup:
    """Exact duplicated-substring spans (Lee et al. 2022 shape)."""

    def test_shared_run_merges_into_one_span(self, spark):
        from tika_spark.analysis.dedup import substring_dup_spans
        df = spark.createDataFrame(
            [(1, "a b c d e f g h i j"),
             (2, "x y c d e f g h q r"),
             (3, "unrelated words entirely here nothing shared now")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               substring_dup_spans(df, k=3).collect()}
        # shared run "c d e f g h" = 4 overlapping shingles -> 1 span, 6 toks
        for i in (1, 2):
            assert out[i]["n_dup_spans"] == 1
            assert out[i]["dup_tokens"] == 6
        assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0

    def test_short_docs_and_disjoint_spans(self, spark):
        from tika_spark.analysis.dedup import substring_dup_spans
        df = spark.createDataFrame(
            [(1, "p q r GAP1 s t u"), (2, "p q r GAP2 s t u"),
             (3, "tiny")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               substring_dup_spans(df, k=3).collect()}
        # "p q r" and "s t u" duplicated, separated by unique GAPx
        for i in (1, 2):
            assert out[i]["n_dup_spans"] == 2
            assert out[i]["dup_tokens"] == 6
        # < k tokens: zero shingles, still a row
        assert out[3]["n_toks"] == 1 and out[3]["n_dup_spans"] == 0

    def test_identical_docs_fully_covered(self, spark):
        from tika_spark.analysis.dedup import substring_dup_spans
        text = " ".join("tok%d" % i for i in range(20))
        df = spark.createDataFrame(
            [(i, text) for i in range(5)], "doc_id long, text string")
        out = substring_dup_spans(df, k=5).collect()
        for r in out:
            assert r["n_dup_spans"] == 1
            assert r["dup_tokens"] == 20 == r["n_toks"]

    def test_hot_shingle_no_pair_blowup(self, spark):
        """A shingle shared by every doc marks one span per doc --
        row count stays linear in docs (no pair set is formed)."""
        from tika_spark.analysis.dedup import substring_dup_spans
        df = spark.createDataFrame(
            [(i, "COMMON HEAD LINE tail%d unique%d" % (i, i))
             for i in range(200)], "doc_id long, text string")
        out = substring_dup_spans(df, k=3)
        assert out.count() == 200
        assert out.filter(F.col("n_dup_spans") == 1).count() == 200


class TestTokenBudget:
    """Scalable global prefix-sum selection under a token budget."""

    def test_matches_naive_global_window(self, spark):
        from pyspark.sql import Window
        from tika_spark.analysis.curation import select_token_budget
        from tika_spark.analysis.textstats import tokens
        rows = [(i, (i * 37) % 100, "w " * (1 + (i * 13) % 30))
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id long, q long, text string")
        fast = select_token_budget(df, budget=500, score_col="q",
                                   partitions=8)
        w = (Window.orderBy(F.desc("score"), F.asc("id"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        naive = (df.select(F.col("doc_id").alias("id"),
                           F.col("q").alias("score"),
                           F.size(tokens(F.col("text"))).cast("long")
                           .alias("n_tok"))
                 .withColumn("cum_tok", F.sum("n_tok").over(w))
                 .filter(F.col("cum_tok") <= 500))
        assert sorted(map(tuple, fast.collect())) == \
            sorted(map(tuple, naive.collect()))

    def test_no_single_task_window(self, spark):
        """The plan must not contain a global (empty-partition-spec)
        window — the whole point of the two-phase prefix sum."""
        from tika_spark.analysis.curation import select_token_budget
        df = spark.createDataFrame(
            [(i, i % 7, "a b c") for i in range(50)],
            "doc_id long, q long, text string")
        out = select_token_budget(df, budget=100, score_col="q",
                                  partitions=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        for m in re.finditer(r"Window .*partitionBy=\[\]", plan):
            raise AssertionError("global window found: " + m.group(0))
        assert "pid" in plan  # per-partition windows are keyed


class TestLmPerplexity:
    """Bigram add-alpha LM perplexity scoring (CCNet filter analog)."""

    def test_pinned_probabilities(self, spark):
        import math
        from tika_spark.analysis.curation import lm_perplexity
        # corpus: "a b" x2 and "a c" -> c(a b)=2, c(a c)=1,
        # c_prefix(a)=3, V={a,b,c}=3, alpha=0.5
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
            "doc_id long, text string")
        out = {r["id"]: r for r in lm_perplexity(df).collect()}
        p_ab = (2 + 0.5) / (3 + 0.5 * 3)
        p_ac = (1 + 0.5) / (3 + 0.5 * 3)
        assert out[1]["nll_micro"] == round(-math.log(p_ab) * 1e6)
        assert out[3]["nll_micro"] == round(-math.log(p_ac) * 1e6)
        assert out[1]["nll_micro"] < out[3]["nll_micro"]  # rarer = worse
        # sub-2-token docs: zero bigrams, still a row
        assert out[4]["n_bigrams"] == 0 and out[4]["nll_micro"] == 0

    def test_word_salad_scores_worse(self, spark):
        from tika_spark.analysis.curation import lm_perplexity
        common = [(i, "the quick brown fox jumps over the lazy dog")
                  for i in range(20)]
        salad = [(100, "dog the over fox quick lazy jumps brown the")]
        df = spark.createDataFrame(
            common + salad, "doc_id long, text string")
        out = {r["id"]: r["nll_micro"] / max(r["n_bigrams"], 1)
               for r in lm_perplexity(df).collect()}
        assert out[100] > out[0]  # scrambled order is improbable


class TestMixtureWeights:
    """Temperature data-mixing weights (token_share^tau)."""

    def test_tau_upweights_small_sources(self, spark):
        from tika_spark.analysis.curation import mixture_weights
        df = spark.createDataFrame(
            [("big", i, "w " * 90) for i in range(9)]
            + [("small", 100, "w " * 90)],
            "source string, doc_id long, text string")
        w = {r["source"]: r for r in
             mixture_weights(df, tau=0.5).collect()}
        # natural shares 0.9 / 0.1 -> sqrt-scaled ~0.75 / 0.25
        assert w["big"]["share_micro"] == 900000
        assert w["small"]["share_micro"] == 100000
        assert w["small"]["weight_micro"] > 100000  # upweighted
        assert w["big"]["weight_micro"] < 900000    # downweighted
        total = w["big"]["weight_micro"] + w["small"]["weight_micro"]
        assert abs(total - 1_000_000) <= 2  # micro-rounding slack

    def test_tau_one_is_natural(self, spark):
        from tika_spark.analysis.curation import mixture_weights
        df = spark.createDataFrame(
            [("a", 1, "x y z"), ("b", 2, "x"), ("b", 3, "x x")],
            "source string, doc_id long, text string")
        w = {r["source"]: r for r in
             mixture_weights(df, tau=1.0).collect()}
        assert w["a"]["weight_micro"] == w["a"]["share_micro"] == 500000
        assert w["b"]["n_tokens"] == 3


class TestSplitLongDocs:
    def test_window_boundaries_and_overlap(self, spark):
        from tika_spark.analysis.curation import split_long_docs
        text = " ".join("t%d" % i for i in range(25))
        df = spark.createDataFrame(
            [(1, text), (2, "a b c")], "doc_id long, text string")
        out = sorted(split_long_docs(df, max_tokens=10, overlap=2)
                     .collect(), key=lambda r: (r["id"], r["chunk_idx"]))
        one = [r for r in out if r["id"] == 1]
        # stride 8: starts 0, 8, 16 -> sizes 10, 10, 9
        assert [r["n_tok"] for r in one] == [10, 10, 9]
        assert one[1]["chunk_text"].split()[:2] == ["t8", "t9"]
        # every token index covered, consecutive chunks overlap by 2
        assert one[2]["chunk_text"].split()[-1] == "t24"
        short = [r for r in out if r["id"] == 2]
        assert len(short) == 1 and short[0]["n_tok"] == 3

    def test_exact_limit_single_chunk(self, spark):
        from tika_spark.analysis.curation import split_long_docs
        df = spark.createDataFrame(
            [(1, " ".join(["w"] * 10)), (2, " ".join(["w"] * 11))],
            "doc_id long, text string")
        out = split_long_docs(df, max_tokens=10, overlap=2)
        counts = {r[0]: 0 for r in [(1,), (2,)]}
        for r in out.collect():
            counts[r["id"]] += 1
        assert counts == {1: 1, 2: 2}

    def test_bad_overlap_rejected(self, spark):
        from tika_spark.analysis.curation import split_long_docs
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            split_long_docs(df, max_tokens=8, overlap=8)


class TestC4Rules:
    """C4 line/page cleaning rules (Raffel et al. 2020 §2.2)."""

    def test_line_and_page_rules(self, spark):
        from tika_spark.analysis.curation import c4_rules
        df = spark.createDataFrame([
            (1, "Good sentence number one.\nAnother full sentence "
                "here!\nIs this a question?\nShort.\nuse javascript "
                "now please.\nA fifth proper sentence stands here."),
            (2, "Lorem ipsum dolor sit amet.\nMore text follows "
                "here.\nAnd a third sentence too.\nPlus the fourth "
                "one now."),
            (3, "function() { return 1; }\nA real sentence here.\n"
                "Another proper sentence follows.\nAnd one more "
                "rounds it out."),
            (4, "no punctuation lines at all\njust fragments"),
        ], "doc_id long, text string")
        out = {r["id"]: r for r in
               c4_rules(df, min_sentences=3).collect()}
        # doc 1: "Short." (<3 words) and the javascript line drop;
        # 4 sentences survive -> keep
        assert out[1]["n_kept"] == 4 and out[1]["keep"]
        assert "javascript" not in out[1]["text_clean"]
        assert "Short." not in out[1]["text_clean"]
        # doc 2: enough sentences, but lorem ipsum kills the page
        assert out[2]["n_sentences"] >= 3 and not out[2]["keep"]
        # doc 3: '{' anywhere on the page kills it
        assert not out[3]["keep"]
        # doc 4: nothing survives the line filter
        assert out[4]["n_kept"] == 0 and not out[4]["keep"]

    def test_shuffle_free(self, spark):
        from tika_spark.analysis.curation import c4_rules
        df = spark.createDataFrame([(1, "A sentence right here.")],
                                   "doc_id long, text string")
        plan = c4_rules(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


def test_shuffle_order_deterministic_and_uniform(spark):
    import hashlib

    from tika_spark.analysis.curation import shuffle_order
    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)],
                               "doc_id long, text string")
    got = {r.doc_id: r.shuffle_rank
           for r in shuffle_order(df).collect()}
    # replay: rank = position in md5-sorted key order
    order = sorted(range(100),
                   key=lambda i: (hashlib.md5(str(i).encode())
                                  .hexdigest(), i))
    exp = {i: pos + 1 for pos, i in enumerate(order)}
    assert got == exp
    # salt re-rolls the order
    got2 = {r.doc_id: r.shuffle_rank
            for r in shuffle_order(df, salt="epoch2").collect()}
    assert got2 != got
    assert sorted(got2.values()) == list(range(1, 101))


def test_gopher_rules_decisions(spark):
    from tika_spark.analysis.curation import gopher_rules
    good = ("the results have shown that careful data curation with "
            "balanced filtering rules can be combined to keep corpus "
            "quality high and to preserve document diversity across "
            "many sources of web text while holding total size down "
            "and the pipeline remains fully reproducible end to end")
    rows = [
        (0, good),                                     # passes all
        (1, "too short to keep"),                      # word count
        (2, good + " ##### " * 10),                    # symbol ratio
        (3, "\n".join("- bullet item here" for _ in range(10))),
        (4, good.replace("the", "zzz").replace("to", "qqq")
            .replace("and", "www").replace("that", "rrr")
            .replace("have", "sss").replace("of", "ttt")
            .replace("with", "uuu").replace("be ", "vvv ")),  # stops
        # ordinary list-bearing page: 5 of 10 lines are bullets —
        # Gopher A1.1 only removes when MORE than 90% are bullets
        (5, "\n".join(("- item on the list here" if i % 2 else
                       "prose line " + good) for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df, min_words=30).collect()}
    assert got[0].keep is True
    assert got[1].keep is False and got[1].r_word_count is False
    assert got[2].r_symbol_ratio is False
    assert got[3].r_bullet_lines is False
    assert got[4].r_stopwords is False
    assert got[5].r_bullet_lines is True


def test_gopher_mean_word_length_bounds(spark):
    from tika_spark.analysis.curation import gopher_rules
    df = spark.createDataFrame(
        [(0, " ".join(["a"] * 60)),                   # mean 1 < 3
         (1, " ".join(["superlongwordhere"] * 60))],  # mean 17 > 10
        "doc_id long, text string")
    got = {r.doc_id: r.r_mean_word_len
           for r in gopher_rules(df).collect()}
    assert got == {0: False, 1: False}


def test_dedup_paragraphs_intra(spark):
    from tika_spark.analysis.curation import dedup_paragraphs_intra
    df = spark.createDataFrame(
        [(0, "intro\nbanner\nbody\nbanner\noutro"),
         (1, "a\na\na\nb"), (2, "solo")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_paragraphs, r.n_removed, r.text_dedup)
           for r in dedup_paragraphs_intra(df).collect()}
    assert got[0] == (5, 1, "intro\nbanner\nbody\noutro")
    assert got[1] == (4, 2, "a\nb")
    assert got[2] == (1, 0, "solo")


class TestChunkDocuments:
    def test_overlap_and_tail(self, spark):
        from tika_spark.analysis.curation import chunk_documents
        words = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")],
                                   "doc_id long, text string")
        got = chunk_documents(df, chunk_words=8,
                              overlap_words=4).collect()
        by = {(r.id, r.chunk_idx): r for r in got}
        # doc 1: starts 0,4,8 → 3 chunks
        assert by[(1, 0)].n_chunks == 3
        assert by[(1, 0)].chunk_text.split() == \
            [f"w{i}" for i in range(8)]
        assert by[(1, 1)].chunk_text.split() == \
            [f"w{i}" for i in range(4, 10)]
        assert by[(1, 2)].chunk_text == "w8 w9"
        assert by[(1, 2)].n_chunk_words == 2
        # doc 2: one short chunk; doc 3 (empty): no rows
        assert by[(2, 0)].n_chunks == 1
        assert (3, 0) not in by
        assert len(got) == 4

    def test_coverage_and_continuity(self, spark):
        from tika_spark.analysis.curation import chunk_documents
        words = " ".join(f"t{i:03d}" for i in range(100))
        df = spark.createDataFrame([(1, words)],
                                   "doc_id long, text string")
        rows = sorted(chunk_documents(df, 30, 10).collect(),
                      key=lambda r: r.chunk_idx)
        seen = []
        for r in rows:
            ws = r.chunk_text.split()
            if seen:        # each chunk repeats the last 10 words
                assert ws[:10] == seen[-10:]
            seen.extend(ws[10:] if seen else ws)
        assert seen == [f"t{i:03d}" for i in range(100)]

    def test_invalid_overlap_raises(self, spark):
        from tika_spark.analysis.curation import chunk_documents
        df = spark.createDataFrame([(1, "x")],
                                   "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError, match="overlap"):
            chunk_documents(df, 8, 8)


class TestLmPerplexityKN:
    """Interpolated Kneser-Ney bigram perplexity (Chen & Goodman
    eq. 4.28 over the self-trained corpus LM)."""

    def test_pinned_probabilities(self, spark):
        import math
        from tika_spark.analysis.curation import lm_perplexity_kn
        # corpus "a b a b c": c(ab)=2 c(ba)=1 c(bc)=1; c1(a)=c1(b)=2;
        # N1+(a,*)=1 N1+(b,*)=2; N1+(*,b)=N1+(*,a)=N1+(*,c)=1; T=3
        df = spark.createDataFrame(
            [(1, "a b a b c"), (2, "x")], "doc_id long, text string")
        out = {r["id"]: r for r in lm_perplexity_kn(df).collect()}
        p_ab = (2 - 0.75) / 2 + 0.75 * (1 / 2) * (1 / 3)   # 0.75
        p_ba = (1 - 0.75) / 2 + 0.75 * (2 / 2) * (1 / 3)   # 0.375
        want = (2 * round(-math.log(p_ab) * 1e6)
                + 2 * round(-math.log(p_ba) * 1e6))
        assert out[1]["n_bigrams"] == 4
        assert out[1]["nll_micro"] == want
        assert out[2]["n_bigrams"] == 0 and out[2]["nll_micro"] == 0

    def test_continuation_beats_raw_frequency(self, spark):
        from tika_spark.analysis.curation import lm_perplexity_kn
        # "francisco" is frequent but only ever follows "san";
        # "common" follows many prefixes. KN's continuation count
        # must prefer the versatile word in a fresh context.
        rows = [(i, "san francisco") for i in range(10)]
        rows += [(100 + i, w + " common") for i, w in enumerate(
            ["very", "quite", "most", "so", "too"])]
        rows += [(200, "new francisco"), (201, "new common")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["id"]: r["nll_micro"]
               for r in lm_perplexity_kn(df).collect()}
        assert out[201] < out[200]


class TestHostBoilerplate:
    """Host-conditioned frequent-line removal."""

    def test_furniture_stripped_per_host(self, spark):
        from tika_spark.analysis.curation import \
            host_boilerplate_removal
        rows = [(i, "a.com", f"NAV BAR\nbody {i}\nFOOTER")
                for i in range(3)]
        rows += [(10, "b.com", "NAV BAR\nunique ten")]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        out = {r.doc_id: r for r in
               host_boilerplate_removal(df).collect()}
        # a.com: NAV/FOOTER on 3 docs -> stripped, body survives
        assert out[0].text_clean == "body 0"
        assert (out[0].n_lines, out[0].n_boiler) == (3, 2)
        # same NAV line on b.com appears once there -> kept
        assert out[10].text_clean == "NAV BAR\nunique ten"
        assert out[10].n_boiler == 0

    def test_repeat_within_one_doc_not_boiler(self, spark):
        from tika_spark.analysis.curation import \
            host_boilerplate_removal
        # the same line 3x in ONE doc is 1 distinct doc, not furniture
        df = spark.createDataFrame(
            [(1, "a.com", "x\nx\nx")],
            "doc_id long, source string, text string")
        r = host_boilerplate_removal(df).collect()[0]
        assert r.n_boiler == 0 and r.text_clean == "x\nx\nx"


class TestBlocklist:
    def test_word_boundary_and_case(self, spark):
        from tika_spark.analysis.curation import blocklist_filter
        df = spark.createDataFrame(
            [(1, "a BAD word"), (2, "embadded inside"),
             (3, "clean text"), (4, "bad bad bad")],
            "doc_id long, text string")
        out = {r.id: r for r in
               blocklist_filter(df, ["bad"]).collect()}
        assert (out[1].n_matches, out[1].keep) == (1, False)
        assert (out[2].n_matches, out[2].keep) == (0, True)  # \b
        assert out[3].keep is True
        assert out[4].n_matches == 3

    def test_empty_terms_keeps_all(self, spark):
        from tika_spark.analysis.curation import blocklist_filter
        df = spark.createDataFrame([(1, "x")],
                                   "doc_id long, text string")
        r = blocklist_filter(df, []).collect()[0]
        assert r.keep is True and r.n_matches == 0

    def test_regex_metachars_escaped(self, spark):
        # terms are words (C4 semantics, \b edges); interior regex
        # metachars must be literal, not wildcards
        from tika_spark.analysis.curation import blocklist_filter
        df = spark.createDataFrame(
            [(1, "uses v1.0 today"), (2, "uses v1a0 today")],
            "doc_id long, text string")
        out = {r.id: r.n_matches for r in
               blocklist_filter(df, ["v1.0"]).collect()}
        assert out[1] == 1 and out[2] == 0   # '.' not a wildcard


class TestPiiExtended:
    def test_luhn_gate(self, spark):
        from tika_spark.analysis.curation import pii_scrub_extended
        df = spark.createDataFrame(
            [(1, "pay 4111 1111 1111 1111 now"),
             (2, "order 1234 5678 9012 3456 ref"),       # fails Luhn
             (3, "twice 5500005555555559 and 5500005555555559"),
             (4, "call +44 20 7946 0958 or a@b.co")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in pii_scrub_extended(df).collect()}
        assert out[1].n_cards == 1 and "<CARD>" in out[1].text_scrubbed
        assert out[2].n_cards == 0 and "1234" in out[2].text_scrubbed
        assert out[3].n_cards == 2
        assert out[3].text_scrubbed == "twice <CARD> and <CARD>"
        assert out[4].n_phones == 1 and out[4].n_emails == 1
        assert out[4].text_scrubbed == "call <PHONE> or <EMAIL>"


class TestEpochMix:
    def test_cap_and_allocation(self, spark):
        from tika_spark.analysis.curation import epoch_mix
        # tiny source (upweighted by tau) hits the 4-epoch cap;
        # big source stays under it
        rows = [(i, "big", "w " * 50) for i in range(20)]
        rows += [(100, "rare", "one two three")]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        out = {r.source: r for r in
               epoch_mix(df, budget_tokens=2500,
                         max_epochs=4).collect()}
        assert out["rare"].epochs_micro == 4_000_000      # capped
        assert out["rare"].served_tokens == 4 * out["rare"].n_tokens
        assert out["big"].epochs_micro < 4_000_000
        assert out["big"].served_tokens <= out["big"].target_tokens
        # plan never invents data beyond the cap
        assert all(r.served_tokens <= 4 * r.n_tokens
                   for r in out.values())


class TestCrawlTrapFlags:
    def test_each_flag_fires_alone(self, spark):
        from tika_spark.analysis.curation import crawl_trap_flags
        rows = [
            (0, "http://a.ex/news/p1"),
            (1, "http://a.ex/x/y/x/y/p"),             # mirror loop
            (2, "http://a.ex/" + "/".join("d%d" % i for i in range(25))),
            (3, "http://a.ex/2020/2021/p"),           # calendar
            (4, "http://a.ex/p?jsessionid=deadbeef"),
            (5, "http://a.ex/p?q=" + "z" * 250),
        ]
        df = spark.createDataFrame(rows, "id long, url string")
        out = {r.id: r for r in crawl_trap_flags(df).collect()}
        assert not out[0].is_trap
        assert out[1].r_repeat_seg and out[1].is_trap
        assert out[2].r_deep_path
        assert out[3].r_calendar
        assert out[4].r_session_id
        assert out[5].r_long_query
        # each trap row fires exactly its own flag
        for i, flag in [(1, "r_repeat_seg"), (2, "r_deep_path"),
                        (3, "r_calendar"), (4, "r_session_id"),
                        (5, "r_long_query")]:
            fired = [f for f in ("r_repeat_seg", "r_deep_path",
                                 "r_calendar", "r_session_id",
                                 "r_long_query")
                     if getattr(out[i], f)]
            assert fired == [flag], (i, fired)

    def test_triple_segment_counts_as_repeat(self, spark):
        from tika_spark.analysis.curation import crawl_trap_flags
        df = spark.createDataFrame([(1, "http://a.ex/a/a/a/p")],
                                   "id long, url string")
        assert crawl_trap_flags(df).collect()[0].r_repeat_seg

    def test_single_year_not_calendar(self, spark):
        from tika_spark.analysis.curation import crawl_trap_flags
        df = spark.createDataFrame(
            [(1, "http://a.ex/2024/story-title")],
            "id long, url string")
        r = crawl_trap_flags(df).collect()[0]
        assert not r.r_calendar and not r.is_trap

    def test_sid_must_be_whole_key(self, spark):
        from tika_spark.analysis.curation import crawl_trap_flags
        # 'classid=' contains 'sid' but is not a session parameter
        df = spark.createDataFrame(
            [(1, "http://a.ex/p?classid=5"),
             (2, "http://a.ex/p?a=1&sid=5")],
            "id long, url string")
        out = {r.id: r for r in crawl_trap_flags(df).collect()}
        assert not out[1].r_session_id
        assert out[2].r_session_id


class TestCrawlTrapPlanShape:
    def test_zero_shuffle(self, spark):
        from tika_spark.analysis.curation import crawl_trap_flags
        df = spark.createDataFrame([(1, "http://a.ex/p")],
                                   "id long, url string")
        plan = crawl_trap_flags(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
