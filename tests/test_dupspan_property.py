"""Property test for dupspan_coverage_documents: on ANY random corpus the
Spark result must equal a pure-Python reference implementation of the
cross-doc duplicated-shingle span semantics (3-gram in >= 2 distinct
docs -> positions -> interval-union islands). Seeded corpora from a tiny
vocabulary force heavy shingle collisions; short (< 3 token) documents
exercise the no-gram path."""

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_manager_spark.workloads.hygiene import dupspan_coverage_documents


def _reference(texts: dict[int, str]):
    gram_docs: dict[str, set[int]] = {}
    for d, t in texts.items():
        toks = t.split()
        for i in range(len(toks) - 2):
            g = " ".join(toks[i : i + 3])
            gram_docs.setdefault(g, set()).add(d)
    out = {}
    for d, t in texts.items():
        toks = t.split()
        dpos = [
            i
            for i in range(len(toks) - 2)
            if len(gram_docs[" ".join(toks[i : i + 3])]) >= 2
        ]
        n_spans = covered = max_span = 0
        prev = start = None
        for p in dpos:
            if prev is None or p - prev > 3:
                n_spans += 1
                covered += 3
                start = p
            else:
                covered += min(3, p - prev)
            max_span = max(max_span, p + 3 - start)
            prev = p
        total = len(toks)
        frac_q = math.floor(covered / total * 1e9 + 0.5)
        out[d] = (len(dpos), n_spans, max_span, covered, total, frac_q)
    return out


@pytest.mark.parametrize("seed,n_docs,vocab", [(11, 40, 6), (12, 25, 4), (13, 60, 10)])
def test_dupspan_matches_python_reference(spark, tmp_path, seed, n_docs, vocab):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    texts = {
        d: " ".join(rng.choices(words, k=rng.randint(1, 30)))
        for d in range(n_docs)
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(["t"] * n_docs),
            "n_chars": pa.array(
                [len(t) for t in texts.values()], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["n_dup_positions"],
            r["n_spans"],
            r["max_span_tokens"],
            r["covered_tokens"],
            r["total_tokens"],
            r["covered_frac_q"],
        )
        for r in dupspan_coverage_documents(spark, str(tmp_path)).collect()
    }
    assert got == _reference(texts)
