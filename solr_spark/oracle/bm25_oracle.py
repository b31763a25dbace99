"""Independent single-node NumPy oracle for BM25 rank identity.

Implements exactly the semantics documented in functions/bm25.py and
functions/smallfloat.py (Solr/Lucene BM25, k1=1.2 b=0.75, SmallFloat
norm quantization, tie-break score desc then docid asc; ref
solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java:48-50)
with NO Spark code shared except the analyzer definition — it is the
"control" side of the reference's control-vs-distributed diff pattern
(solr/test-framework/src/java/org/apache/solr/BaseDistributedSearchTestCase.java).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from solr_spark.analysis.analyzer import tokenize_py
from solr_spark.functions.bm25 import idf_py, tf_part_py
from solr_spark.functions.smallfloat import DECODE_TABLE


def _quantize(n: int) -> int:
    # largest decode-table entry <= n (table is strictly increasing)
    import bisect

    return DECODE_TABLE[bisect.bisect_right(DECODE_TABLE, n) - 1]


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # term -> {docid: tf}
    dl_q: dict[int, int]
    n_docs: int
    avgdl: float

    @classmethod
    def build(cls, docs: list[tuple[int, str]]) -> "OracleIndex":
        postings: dict[str, dict[int, int]] = {}
        dl_q: dict[int, int] = {}
        total = 0
        for docid, content in docs:
            toks = tokenize_py(content)
            total += len(toks)
            dl_q[docid] = _quantize(len(toks))
            for term, tf in Counter(toks).items():
                postings.setdefault(term, {})[docid] = tf
        n = len(docs)
        return cls(postings, dl_q, n, (total / n) if n else 0.0)

    def search(self, qtext: str, k: int = 10, mode: str = "OR") -> list[tuple[int, float]]:
        qterms = Counter(tokenize_py(qtext))
        present = [t for t in qterms if t in self.postings]
        if not present or (mode == "AND" and len(present) < len(qterms)):
            return []
        scores: dict[int, float] = {}
        matched: dict[int, int] = {}
        for t in present:
            idf = idf_py(len(self.postings[t]), self.n_docs)
            for docid, tf in self.postings[t].items():
                c = qterms[t] * idf * tf_part_py(tf, self.dl_q[docid], self.avgdl)
                scores[docid] = scores.get(docid, 0.0) + c
                matched[docid] = matched.get(docid, 0) + 1
        items = [
            (d, s)
            for d, s in scores.items()
            if mode != "AND" or matched[d] == len(present)
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]
