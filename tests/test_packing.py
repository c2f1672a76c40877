"""Sequence-packing semantics: chunk arithmetic, greedy invariants
(no pack over budget except oversized singletons, in-order scan), and
determinism of both tiers."""

import pandas as pd
import pytest

from cuplyr_spark import from_pandas
from cuplyr_spark.pipeline import packing as PK


@pytest.fixture(scope="module")
def counted(spark):
    rows = [(i, 100 + (i * 37) % 400) for i in range(50)]
    rows.append((50, 5000))  # oversized: alone in its pack, never split
    return from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "n_tokens"]))


def test_concat_chunks_offsets(counted):
    out = (
        PK.pack_concat_chunks(counted, budget=1000, shards=4)
        .collect()
        .sort_values(["shard", "doc_id"])
    )
    for _, grp in out.groupby("shard"):
        # offsets are the exclusive prefix sum in id order
        expect = grp["n_tokens"].cumsum().shift(fill_value=0)
        assert grp["start_offset"].tolist() == expect.tolist()
        assert (grp["pack_first"] == grp["start_offset"] // 1000).all()
        last_tok = grp["start_offset"] + grp["n_tokens"] - 1
        assert (grp["pack_last"] == last_tok // 1000).all()
    # the 5000-token doc spans >= 5 chunks
    big = out[out.doc_id == 50].iloc[0]
    assert big.n_packs_spanned >= 5


def test_greedy_invariants(counted):
    out = (
        PK.pack_greedy(counted, budget=1000, shards=4)
        .collect()
        .sort_values(["shard", "doc_id"])
    )
    assert len(out) == 51  # nothing dropped or duplicated by the join-back
    for (_, pack), grp in out.groupby(["shard", "pack_id"]):
        total = grp["n_tokens"].sum()
        assert total <= 1000 or len(grp) == 1  # over-budget only when alone
        assert grp["pack_tokens"].iloc[-1] == total
        assert grp["pack_pos"].tolist() == list(range(len(grp)))
    # packs are filled in id order: pack_id is non-decreasing per shard
    for _, grp in out.groupby("shard"):
        assert grp["pack_id"].is_monotonic_increasing
    big = out[out.doc_id == 50].iloc[0]
    assert big.pack_pos == 0 and big.pack_tokens == 5000


def test_greedy_deterministic(counted):
    a = PK.pack_greedy(counted, budget=1000, shards=4).collect()
    b = PK.pack_greedy(counted, budget=1000, shards=4).collect()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_bad_args(counted):
    with pytest.raises(ValueError):
        PK.pack_concat_chunks(counted, budget=0)
    with pytest.raises(ValueError):
        PK.pack_greedy(counted, budget=100, shards=0)


def test_pack_greedy_zero_token_doc_shares_pack(spark):
    """A zero-token document followed by an over-budget one stays in the
    same pack (cur==0 never opens a new pack) — the recurrence the
    sequence_pack_greedy oracle now mirrors exactly (ADVICE r2)."""
    rows = [(0, 0), (1, 2000), (2, 500)]
    f = from_pandas(spark, pd.DataFrame(rows, columns=["doc_id", "n_tokens"]))
    out = (
        PK.pack_greedy(f, budget=1000, shards=1)
        .collect()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "pack_id"] == 0 and out.loc[1, "pack_id"] == 0
    assert out.loc[2, "pack_id"] == 1 and out.loc[2, "pack_pos"] == 0
    assert out.loc[1, "pack_tokens"] == 2000
