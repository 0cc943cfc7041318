"""BPE encode/apply pass (r7 VERDICT task 1) — hand-oracled semantics.

The registry oracle (test_registry_oracle.py: bpe_encode, pack_bpe_budget)
checks engine-vs-DuckDB parity; this file pins the MATH itself with a
corpus small enough to run greedy BPE by hand, so an error that slipped
into both twins identically would still be caught."""

from __future__ import annotations

from responsive_pub_spark.operators import bpe


def _docs(spark):
    # word freqs: 'aaab' x3, 'ab' x2
    return spark.createDataFrame(
        [(1, "aaab aaab ab", "en"), (2, "ab aaab", "en")],
        "doc_id BIGINT, text STRING, lang STRING",
    )


def test_bpe_encode_matches_hand_run(spark):
    """k=2 greedy BPE by hand:
    step 1 pair counts: (a,a)=6, (a,b)=5 -> merge (a,a):
      'aaab' -> [aa, a, b] (left-to-right, non-overlapping), 'ab' -> [a, b]
    step 2 pair counts: (aa,a)=3, (a,b)=5 -> merge (a,b):
      'aaab' -> [aa, ab], 'ab' -> [ab]
    seg map: aaab -> 2 tokens, ab -> 1 token."""
    rows = {
        r["doc_id"]: r
        for r in bpe.bpe_encode(_docs(spark), k=2).collect()
    }
    assert rows[1]["n_ws_tokens"] == 3
    assert rows[1]["n_bpe_tokens"] == 2 + 2 + 1
    assert rows[1]["bpe_per_token_bp"] == (10000 * 5) // 3
    assert rows[2]["n_ws_tokens"] == 2
    assert rows[2]["n_bpe_tokens"] == 1 + 2
    assert rows[2]["bpe_per_token_bp"] == 15000


def test_segment_map_matches_hand_run(spark):
    seg = {
        r["word"]: r["n_bpe"]
        for r in bpe.bpe_segment_map(_docs(spark), k=2).collect()
    }
    assert seg == {"aaab": 2, "ab": 1}


def test_pack_sequences_bpe_budgets_on_real_tokens(spark):
    """Composition: packing runs on the LEARNED token counts (5, 3), not
    whitespace counts (3, 2) — budget 4: doc 1 starts seq 0 offset 0,
    doc 2 starts at cumulative token 5 -> seq 1 offset 1."""
    rows = {
        r["doc_id"]: r
        for r in bpe.pack_sequences_bpe(_docs(spark), k=2, budget=4).collect()
    }
    assert (rows[1]["n_tokens"], rows[1]["seq_id"], rows[1]["seq_offset"]) == (
        5,
        0,
        0,
    )
    assert (rows[2]["n_tokens"], rows[2]["seq_id"], rows[2]["seq_offset"]) == (
        3,
        1,
        1,
    )


def test_bpe_token_ids_reassemble_and_contiguity(spark):
    """Token-id invariants on a hand-checkable corpus: per-word token
    concatenation reassembles the original word, ids are contiguous
    0..V-1 in lexicographic symbol order, and every (doc, word) slot of
    the corpus is covered exactly once."""
    docs = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab ba")], "doc_id BIGINT, text STRING"
    )
    rows = bpe.bpe_token_ids(docs, k=2).collect()

    # coverage: one (doc_id, word_idx) group per corpus word
    slots = {(r.doc_id, r.word_idx) for r in rows}
    assert slots == {(1, 0), (1, 1), (1, 2), (2, 0), (2, 1)}

    # reassembly: tokens in sub_idx order concatenate to the word
    words = {(1, 0): "aa", (1, 1): "ab", (1, 2): "aa", (2, 0): "ab", (2, 1): "ba"}
    by_slot: dict = {}
    for r in rows:
        by_slot.setdefault((r.doc_id, r.word_idx), []).append((r.sub_idx, r.token))
    for slot, toks in by_slot.items():
        assert "".join(t for _, t in sorted(toks)) == words[slot]

    # id table: contiguous ranks of the sorted symbol inventory
    inv = sorted({r.token for r in rows})
    assert {(r.token, r.token_id) for r in rows} == {
        (t, i) for i, t in enumerate(inv)
    }


def test_pack_token_ids_rolls_over_budget_boundaries(spark):
    """r8 review: pos must ALWAYS land in [0, budget) — a doc spanning a
    budget boundary rolls into the next sequence. Fixture: doc 1 emits 5
    BPE tokens (aaab->2, aaab->2, ab->1), doc 2 emits 3 (ab->1, aaab->2);
    budget 4 -> global positions 0..7 = seq 0 pos 0..3, seq 1 pos 0..3."""
    rows = bpe.pack_token_ids(_docs(spark), k=2, budget=4).collect()
    assert len(rows) == 8
    assert all(0 <= r.pos < 4 for r in rows), rows
    got = sorted((r.seq_id, r.pos) for r in rows)
    assert got == [(0, 0), (0, 1), (0, 2), (0, 3), (1, 0), (1, 1), (1, 2), (1, 3)]
    # the spanning doc's 5th token IS seq 1 pos 0 (rollover, not pos 4)
    assert (1, 0) in got
