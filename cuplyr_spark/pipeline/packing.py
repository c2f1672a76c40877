"""Sequence packing for LLM pre-training pipelines: assign documents
to fixed token-budget training sequences.

Two tiers, both deterministic (no RNG, stable across runs/engines):

- :func:`pack_concat_chunks` — GPT-style concat-and-chunk: documents
  are laid end-to-end in id order and the token stream is cut every
  ``budget`` tokens; a document may straddle a cut. Pure keyed-window
  math (one shuffle on the shard key), SQL-expressible, so the DuckDB
  oracle can verify it.
- :func:`pack_greedy` — documents are never split: a new pack opens
  when the next document would overflow the budget. Inherently a
  sequential scan, so it runs as an Arrow-batched ``applyInPandas``
  per shard — the one pipeline op here that genuinely needs
  per-partition imperative logic.

Scale design: work is sharded by ``id % shards`` (documents have dense
synthetic ids; swap in a hash for skewed id spaces). Each shard's
window/pandas group is independent — parallelism == shards, no global
sort, no single-task window. Size ``shards`` so one shard's (id,
n_tokens) pairs fit an executor: at 100 TB / ~1e11 docs, 1e5 shards
keeps a shard at ~1e6 16-byte rows. Only ids and token counts move
through the shuffle — never document text (join packs back by id).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from cuplyr_spark.frame import Frame


def _sharded(frame: Frame, id_col: str, shards: int):
    if shards < 1:
        raise ValueError("shards must be >= 1")
    return frame.df.withColumn(
        "shard", (F.col(id_col) % F.lit(shards)).cast("long")
    )


def pack_concat_chunks(
    frame: Frame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shards: int = 32,
) -> Frame:
    """Concat-and-chunk packing: within each shard, documents are
    concatenated in ``id_col`` order and cut every ``budget`` tokens.

    Adds:
    - ``shard`` — ``id % shards``; (shard, pack) is the global pack key
    - ``start_offset`` — the document's first token's position in the
      shard's concatenated stream
    - ``pack_first`` / ``pack_last`` — chunk index of the document's
      first / last token (a doc spanning a cut has pack_last >
      pack_first)
    - ``n_packs_spanned`` — how many chunks the document touches

    One hash-partition shuffle on ``shard``; the per-shard window is
    ordered by id, so no global sort exists anywhere in the plan.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    df = _sharded(frame, id_col, shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok = F.col(token_col).cast("long")
    start = F.coalesce(F.sum(tok).over(w), F.lit(0)).cast("long")
    df = df.withColumn("start_offset", start)
    end_incl = F.col("start_offset") + F.greatest(tok, F.lit(1)) - 1
    df = (
        df.withColumn("pack_first", (F.col("start_offset") / budget).cast("long"))
        .withColumn("pack_last", (end_incl / budget).cast("long"))
        .withColumn(
            "n_packs_spanned", (F.col("pack_last") - F.col("pack_first") + 1)
        )
    )
    return Frame(df, frame.group_vars())


_PACK_SCHEMA_COLS = [
    StructField("shard", LongType()),
    StructField("pack_id", LongType()),
    StructField("pack_pos", LongType()),
    StructField("pack_tokens", LongType()),
]


def pack_greedy(
    frame: Frame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shards: int = 32,
) -> Frame:
    """Greedy no-split packing: scan each shard in ``id_col`` order,
    opening a new pack whenever the next document would push the
    running total past ``budget``. Documents larger than the budget
    get a pack of their own (never truncated here — filter or split
    upstream if that is unacceptable).

    Adds ``shard``, ``pack_id`` (within shard), ``pack_pos`` (document
    position within its pack) and ``pack_tokens`` (running pack total
    after this document). The scan is inherently sequential per shard,
    so it is an Arrow-batched ``applyInPandas`` over (id, tokens)
    pairs only — document payloads stay out of the shuffle; join the
    result back by id for the full rows.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    slim = _sharded(frame.select(id_col, token_col), id_col, shards)

    out_schema = StructType(
        [
            StructField(id_col, slim.schema[id_col].dataType),
            *_PACK_SCHEMA_COLS,
        ]
    )

    def pack_one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        toks = pdf[token_col].to_numpy()
        shard = int(pdf["shard"].iloc[0])
        pack_ids, positions, totals = [], [], []
        pack, pos, cur = 0, 0, 0
        for t in toks:
            t = int(t)
            if cur > 0 and cur + t > budget:
                pack += 1
                pos, cur = 0, 0
            cur += t
            pack_ids.append(pack)
            positions.append(pos)
            totals.append(cur)
            pos += 1
        return pd.DataFrame(
            {
                id_col: ids,
                "shard": shard,
                "pack_id": pack_ids,
                "pack_pos": positions,
                "pack_tokens": totals,
            }
        )

    assigned = slim.groupBy("shard").applyInPandas(pack_one_shard, out_schema)
    joined = frame.df.join(assigned, on=id_col, how="inner")
    return Frame(joined, frame.group_vars())
