"""Semantic tests for inverted-index conjunctive search and the
Laplace DP release: replay in pandas / check mechanism properties."""

from __future__ import annotations

import math
import re

import pandas as pd

from conftest import SF_SMOKE


def test_inverted_search_replay(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.text_queries import (
        _SEARCH_TERMS,
        QUERIES,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n = float(len(docs))
    toks = {
        r.doc_id: re.split(r"[^a-z0-9]+", r.text.lower())
        for r in docs.itertuples()
    }
    df = {
        x: sum(1 for ts in toks.values() if x in ts) for x in _SEARCH_TERMS
    }
    scored = []
    for doc_id, ts in toks.items():
        tf = {x: ts.count(x) for x in _SEARCH_TERMS}
        if all(tf[x] > 0 for x in _SEARCH_TERMS):
            s = 0.0
            for x in _SEARCH_TERMS:  # same fixed accumulation order
                s += tf[x] * math.log(n / df[x])
            scored.append((doc_id, round(s, 6)))
    scored.sort(key=lambda p: (-p[1], p[0]))
    expected = scored[:20]

    got = [
        (r.doc_id, r.score)
        for r in QUERIES["inverted_index_search"](spark, SF_SMOKE).collect()
    ]
    assert got == expected
    assert len(got) == 20


def test_dp_noise_properties(spark):
    from tb_scale_spatial_data_pipeline_spark.plans.quality_queries import (
        _DP_B,
        QUERIES,
    )

    rows = QUERIES["dp_noisy_counts"](spark, SF_SMOKE).collect()
    noises = [r.noisy_count - r.true_count for r in rows]
    # noise actually perturbs (not the identity release) ...
    assert sum(1 for z in noises if abs(z) > 1e-9) > len(noises) * 0.9
    # ... is two-sided ...
    assert any(z > 0 for z in noises) and any(z < 0 for z in noises)
    # ... and its spread is in the right ballpark for Laplace(b):
    # mean |noise| = b; allow a generous band for ~100 draws.
    mean_abs = sum(abs(z) for z in noises) / len(noises)
    assert 0.3 * _DP_B < mean_abs < 3.0 * _DP_B
    # determinism: same release on re-run (md5-seeded, not RNG)
    again = QUERIES["dp_noisy_counts"](spark, SF_SMOKE).collect()
    assert rows == again


def test_bpe_merges_match_reference_algorithm(spark):
    """Replay Sennrich-style BPE training in pure Python on the same
    word-type counts and compare the learned merge table."""
    import collections

    from tb_scale_spatial_data_pipeline_spark.plans.lm_queries import (
        _BPE_MERGES,
        QUERIES,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    words = collections.Counter()
    for text in docs.text:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}

    expected = []
    for rnd in range(1, _BPE_MERGES + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (lft, rgt), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((rnd, lft, rgt, pc))
        merged = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        vocab = merged

    got = [
        (r.merge_round, r.lft, r.rgt, r.pair_count)
        for r in QUERIES["bpe_merge_train"](spark, SF_SMOKE).collect()
    ]
    assert got == expected
    # nonvacuity: a later merge must build on an earlier merged symbol
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got[1:])
