"""Training-sequence packing — the step between a cleaned corpus and a
trainer: deterministically shuffle documents into output shards, then
pack them into fixed token-budget sequences (context windows).

Two packing disciplines, both used in practice:

- ``pack_offsets`` — GPT-style concat-and-chunk: documents are
  concatenated in shard order and the stream is cut every ``budget``
  tokens; documents may straddle a cut. Pure window algebra (one
  cumulative sum), exactly SQL-replicable.
- ``pack_greedy`` — document-boundary-respecting next-fit: a document
  never straddles a sequence; a new sequence starts when the current
  one cannot fit the next document. Inherently a sequential fold per
  shard → ``applyInPandas`` per shard group (the shard is the
  parallelism unit), oracle-replicable with a recursive CTE.

No reference counterpart (racket-linkeddata does no text analysis);
part of the LLM-pipeline brief.

100 TB shape: the deterministic shuffle is ONE row_number window
partitioned by ``shard`` — an entire shard lands in one task, exactly
like the shard file a training-data writer emits, so ``n_shards`` is
the parallelism unit and must be sized so a shard fits a task (the
same contract as the output writer; thousands of shards at 100 TB).
Everything downstream (cumsum, the greedy fold) rides the SAME
partitioning — one shuffle total. No driver actions, no collects.

Contract: ``id_col`` unique and non-NULL (the usual sharding
contract) — a NULL id hashes like the empty string and duplicate ids
make the within-tie order nondeterministic.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

# deterministic pseudo-random permutation key: md5 of the id — the
# same conv(substr(md5,1,15),16,10) <-> CAST('0x'||substr AS BIGINT)
# cross-engine pair the minhash oracle pins
def _key(id_col: str):
    return F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("")))


def _shard(id_col: str, n_shards: int):
    return (F.conv(F.substring(_key(id_col), 1, 15), 16, 10)
            .cast("bigint") % F.lit(n_shards)).alias("shard")


def shuffle_shards(docs: DataFrame, n_shards: int, *,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle: input columns + ``shard`` (md5-mod)
    and ``pos`` (1-based md5-order position within the shard). The
    training-data answer to "randomize document order, reproducibly" —
    no RNG state, any engine recomputes the identical permutation."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    w = Window.partitionBy("shard").orderBy(_key(id_col), id_col)
    return (docs
            .withColumn("shard", _shard(id_col, n_shards))
            .withColumn("pos", F.row_number().over(w).cast("bigint")))


def pack_offsets(docs: DataFrame, budget: int, n_shards: int, *,
                 token_col: str = "n_tokens",
                 id_col: str = "doc_id") -> DataFrame:
    """Concat-and-chunk packing plan: per document, its byteless
    placement in the shard's token stream —
    ``(id, shard, pos, n_tokens, start_off, end_off, first_seq,
    last_seq)`` where ``[start_off, end_off)`` is the token interval
    and ``first_seq``/``last_seq`` the budget-sized sequences it
    touches (``first_seq != last_seq`` = the document straddles a
    cut). A zero-token document sits at its offset inside a single
    sequence. One window cumsum over the shuffle_shards partitioning —
    no extra shuffle."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    w = (Window.partitionBy("shard").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (shuffle_shards(docs, n_shards, id_col=id_col)
            .select(id_col, "shard", "pos", toks.alias("n_tokens"))
            .withColumn("end_off", F.sum("n_tokens").over(w))
            .select(
                id_col, "shard", "pos", "n_tokens",
                (F.col("end_off") - F.col("n_tokens")).alias("start_off"),
                "end_off",
                # integer division (div) — exact at any corpus size
                F.expr(f"(end_off - n_tokens) div {budget}")
                .alias("first_seq"),
                F.expr(f"greatest(end_off - 1, end_off - n_tokens) "
                       f"div {budget}").alias("last_seq")))


def packing_stats(docs: DataFrame, budget: int, n_shards: int, *,
                  token_col: str = "n_tokens",
                  id_col: str = "doc_id") -> DataFrame:
    """Observability face: per shard, document/token totals, the
    sequence count a concat-and-chunk pack emits
    (``ceil(total/budget)``), the tokens of padding its tail sequence
    wastes, and how many documents straddle a cut — the numbers an
    operator balances ``budget``/``n_shards`` with."""
    packed = pack_offsets(docs, budget, n_shards,
                          token_col=token_col, id_col=id_col)
    return (packed
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 # greatest(..., 1): a shard whose docs all have zero
                 # tokens still occupies sequence 0 in pack_offsets —
                 # the two faces must agree (review r06c)
                 F.expr(f"greatest((sum(n_tokens) + {budget} - 1) "
                        f"div {budget}, 1)").alias("n_seqs"),
                 F.expr(f"greatest((sum(n_tokens) + {budget} - 1) "
                        f"div {budget}, 1) * {budget} - sum(n_tokens)")
                 .alias("tail_padding"),
                 F.sum(F.when(F.col("first_seq") != F.col("last_seq"),
                              1).otherwise(0))
                 .cast("bigint").alias("n_straddlers")))


def pack_greedy(docs: DataFrame, budget: int, n_shards: int, *,
                token_col: str = "n_tokens",
                id_col: str = "doc_id") -> DataFrame:
    """Document-boundary-respecting next-fit packing:
    ``(id, shard, pos, n_tokens, seq_id)`` — walk the shard in shuffle
    order, open a new sequence whenever the current one cannot fit the
    next document. A document longer than ``budget`` gets a sequence
    of its own (the trainer's truncation policy is out of scope).

    The fold is sequential per shard — Arrow ``applyInPandas`` over
    the shard groups (the shard is the parallelism unit; the groupBy
    rides the same hash partitioning as shuffle_shards' window). The
    next-fit discipline (vs first-fit) is what keeps it replayable as
    a linear recurrence — the recursive-CTE oracle in the driver
    replicates it row for row."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    base = (shuffle_shards(docs, n_shards, id_col=id_col)
            .select(F.col(id_col),
                    "shard", "pos",
                    F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
                    .alias("n_tokens")))
    id_field = base.schema[id_col]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from .util import worker_runtime_tune
        worker_runtime_tune()
        pdf = pdf.sort_values("pos", kind="stable")
        seqs = []
        seq, fill = 0, 0
        # guard on position, not fill > 0: after the first doc the
        # current sequence is always occupied, and a fill-based guard
        # let an over-budget doc share a sequence opened by a
        # zero-token doc (review r06c)
        for i, t in enumerate(pdf["n_tokens"]):
            if i > 0 and fill + t > budget:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            fill += t
        out = pdf.copy()
        out["seq_id"] = pd.array(seqs, dtype="int64")
        return out

    schema = (f"{id_col} {id_field.dataType.simpleString()}, "
              "shard bigint, pos bigint, n_tokens bigint, seq_id bigint")
    return base.groupBy("shard").applyInPandas(fold, schema)
