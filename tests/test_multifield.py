"""Multi-field search gates: per-field index docID consistency and
(e)dismax combination semantics (solr DisMaxQParser / Lucene
DisjunctionMaxQuery over fields).

The bit-exact parity gate for edismax lives in the driver entries
(edismax_top10 / edismax_pf_top10 / field_title_term vs their DuckDB
oracles); these tests pin the structural invariants the combination
relies on.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

F32 = np.float32


@pytest.fixture(scope="module")
def two_fields(spark, small_corpus, tmp_path_factory):
    """Two per-field indexes over the SAME corpus keys: 'content' = the
    full text, 'head' = the first 5 whitespace tokens."""
    from lucene_solr_spark.corpusgen import CORPUS_SCHEMA
    from lucene_solr_spark.indexing.build import IndexWriter, merge_postings
    from lucene_solr_spark.search.executor import IndexSearcher

    corpus = spark.createDataFrame(small_corpus, schema=CORPUS_SCHEMA)
    head = corpus.withColumn(
        "content",
        F.array_join(F.slice(F.split(F.col("content"), " ", -1), 1, 5), " "),
    )
    searchers = {}
    for name, df in [("content", corpus), ("head", head)]:
        d = str(tmp_path_factory.mktemp(f"mf_{name}"))
        IndexWriter(spark, d, docs_per_segment=64, n_batches=2).build(df)
        merge_postings(spark, d, segs_per_group=4)
        searchers[name] = IndexSearcher(spark, d)
    return searchers


def test_docids_consistent_across_fields(spark, two_fields):
    """Deterministic dense-rank docID assignment => per-field indexes
    share one docID space (Lucene's per-segment invariant)."""
    from lucene_solr_spark.indexing.build import _as_list

    def keys(s):
        return spark.read.parquet(
            *_as_list(s.snap.tables["docs"])
        ).select("doc_id", "repo", "path", "commit")

    a, b = keys(two_fields["content"]), keys(two_fields["head"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_edismax_single_field_tie0_equals_search(two_fields):
    """qf one field, tie=0 degenerates to the plain per-field search."""
    from lucene_solr_spark.search.multifield import MultiFieldSearcher

    mfs = MultiFieldSearcher(two_fields)
    got = mfs.edismax("seven hundred", qf={"content": 1.0}, tie=0.0,
                      k=10).collect()
    want = two_fields["content"].search("seven hundred", k=10).collect()
    assert [(r.doc_id, F32(r.score)) for r in got] == \
        [(r.doc_id, F32(r.score)) for r in want]


def test_edismax_dismax_float_order(two_fields):
    """Cross-field dismax reproduces DisjunctionMaxScorer float math:
    per clause f32(max + f32(f32(sum-max)*tie)), clauses summed in
    double, against a driver-side recomputation from the per-field
    all-match legs."""
    from lucene_solr_spark.search.multifield import MultiFieldSearcher

    qf = {"head": 2.0, "content": 1.0}
    tie = F32(0.3)
    mfs = MultiFieldSearcher(two_fields)
    words = ["seven", "hundred"]
    # reference combine in numpy, from the same (gated) kernel legs
    per_doc = {}
    for w in words:
        legs = []
        for f_name, boost in qf.items():
            rows = two_fields[f_name].search_boolean(
                f"{w}^{boost!r}", k=None).collect()
            legs.append({r.doc_id: F32(r.score) for r in rows})
        docs = set().union(*[set(l) for l in legs])
        for d in docs:
            ss = [l[d] for l in legs if d in l]
            mx = max(ss)
            sm = F32(0.0)
            for s in ss:
                sm = F32(sm + s)
            dm = F32(mx + F32(F32(sm - mx) * tie))
            per_doc.setdefault(d, []).append(dm)
    want = sorted(
        ((d, F32(np.float64(sum(np.float64(x) for x in xs))))
         for d, xs in per_doc.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = mfs.edismax(" ".join(words), qf=qf, tie=float(tie), k=10).collect()
    assert [(r.doc_id, F32(r.score)) for r in got] == want


class TestMMSpec:
    """SolrPluginUtils.calculateMinShouldMatch grammar + f32 percent
    arithmetic (the published Solr mm examples)."""

    def test_simple_and_negative(self):
        from lucene_solr_spark.search.mmspec import (
            calculate_min_should_match as c)

        assert c(5, "3") == 3
        assert c(5, "-2") == 3
        assert c(2, "3") == 2      # clamped to n
        assert c(3, "-5") == 0     # clamped to 0

    def test_percent_f32_chain(self):
        from lucene_solr_spark.search.mmspec import (
            calculate_min_should_match as c)

        # (n*pct)*(1/100f) rounds to the exact value in f32 for these
        assert c(4, "75%") == 3
        assert c(4, "-25%") == 3
        assert c(4, "-50%") == 2
        assert c(10, "50%") == 5

    def test_conditionals(self):
        from lucene_solr_spark.search.mmspec import (
            calculate_min_should_match as c)

        spec = "2<-25% 9<-3"
        assert c(2, spec) == 2     # n <= first bound: all required
        assert c(4, spec) == 3     # -25% branch
        assert c(10, spec) == 7    # -3 branch (applied after -25%)
        assert c(10, "3<9") == 9


def test_pf2_pf3_shingled_phrase_boost(two_fields, small_corpus):
    """pf2/pf3 (ExtendedDismaxQParser.addShingledPhraseQueries
    :495-560): bigram windows boost only docs containing the adjacent
    window phrase; pf3 with fewer query words than the shingle size
    is a no-op."""
    from lucene_solr_spark.search.multifield import MultiFieldSearcher

    mfs = MultiFieldSearcher(two_fields)
    qf = {"content": 1.0, "head": 1.0}
    # a real adjacent bigram straight from the corpus fixture
    content = small_corpus[0]["content"]
    toks = two_fields["content"].analyzer.analyze_with_positions(content)
    pair = next((t1, t2) for (t1, p1), (t2, p2) in zip(toks, toks[1:])
                if p2 == p1 + 1 and t1 != t2)
    q = f"{pair[0]} {pair[1]}"
    base = {r["doc_id"]: r["score"] for r in mfs.edismax(
        q, qf=qf, tie=0.5, k=None).collect()}
    boosted = {r["doc_id"]: r["score"] for r in mfs.edismax(
        q, qf=qf, tie=0.5, k=None, pf2={"content": 2.0}).collect()}
    assert set(base) == set(boosted)
    ph_docs = {r["doc_id"] for r in two_fields["content"].search_phrase(
        q, k=None).collect()}
    assert ph_docs
    for d, s in base.items():
        if d in ph_docs:
            assert boosted[d] > s
        else:
            assert boosted[d] == s
    pf3_same = {r["doc_id"]: r["score"] for r in mfs.edismax(
        q, qf=qf, tie=0.5, k=None, pf3={"content": 2.0}).collect()}
    assert pf3_same == base


def test_pf3_trigram_batched_equals_per_leg(two_fields, small_corpus):
    """A REAL 3-word pf3 window through the batched kernel
    (search_phrase_windows) must equal the per-leg composition the
    reference plan describes: main + f32(sum of window phrase legs)
    where each leg is the field's boosted exact-phrase query — the
    same equality the pre-batching union + sum produced."""
    import numpy as np

    from lucene_solr_spark.search.multifield import MultiFieldSearcher

    mfs = MultiFieldSearcher(two_fields)
    qf = {"content": 1.0, "head": 1.0}
    s = two_fields["content"]
    content = small_corpus[0]["content"]
    toks = s.analyzer.analyze_with_positions(content)
    tri = next(
        (t1, t2, t3)
        for (t1, p1), (t2, p2), (t3, p3) in zip(toks, toks[1:], toks[2:])
        if p2 == p1 + 1 and p3 == p2 + 1 and len({t1, t2, t3}) == 3)
    q = " ".join(tri)
    base = {r["doc_id"]: r["score"] for r in mfs.edismax(
        q, qf=qf, tie=0.5, k=None).collect()}
    boosted = {r["doc_id"]: r["score"] for r in mfs.edismax(
        q, qf=qf, tie=0.5, k=None, pf3={"content": 2.0}).collect()}
    # per-leg equivalent: ONE trigram window = one boosted phrase leg
    leg = {r["doc_id"]: r["score"] for r in
           s.search_boolean(f'"{q}"^2.0', k=None).collect()}
    assert leg, "fixture trigram must match at least its source doc"
    for d, sc in base.items():
        if d in leg:
            exp = np.float32(sc + np.float32(leg[d]))
            assert boosted[d] == exp
        else:
            assert boosted[d] == sc
