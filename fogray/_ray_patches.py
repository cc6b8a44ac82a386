"""Targeted runtime fix for a Ray 2.49 hash-shuffle join bug.

Bug (ray/data/_internal/execution/operators/hash_shuffle.py): the
shuffle operator broadcasts input schemas to its aggregator pool only
with the FIRST block of each input sequence (``_has_schemas_broadcasted``
is set as soon as that block is *submitted*), but:

- ``_shuffle_block`` short-circuits on ``block.num_rows == 0`` and
  returns WITHOUT fanning out the schema-carrying empty shards, and
- Ray's block builders emit empty map outputs as ZERO-COLUMN tables, so
  an empty first block carries no schema to broadcast anyway.

So whenever the first block of a join input is empty (upstream filter,
upstream join's empty partition), aggregator partitions that receive no
later rows build zero-column tables and ``JoinAggregation.finalize``
dies with ``ArrowInvalid: No match or multiple matches for key field
reference FieldRef.Name(...)`` — or silently emits 0-column blocks.

The patch wraps ``_shuffle_block`` so that EVERY non-empty block fans
out schema-carrying empty shards to the partitions it has no rows for
(``send_empty_blocks=True``), making every aggregator partition learn
the input schema no matter which block arrives first. Overhead: at most
``num_partitions`` tiny object puts per shuffle task, amortized away by
normal-size blocks whose rows already touch most partitions.

Applied from ``fogray/__init__.py``; a Ray version drift makes the
patch a no-op (the try/except below) rather than an error.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

_APPLIED = False


def apply() -> bool:
    global _APPLIED
    if _APPLIED:
        return True
    try:
        import ray
        from ray.data._internal.execution.operators import hash_shuffle as _hs

        orig_fn = _hs._shuffle_block._function  # undecorated original

        def _shuffle_block_schema_safe(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=False,
            override_partition_id=None,
        ):
            if block_transformer is not None:
                block = block_transformer(block)
                block_transformer = None
            block = _hs.TableBlockAccessor.try_convert_block_type(
                block, block_type=_hs.BlockType.ARROW
            )
            if block.num_rows == 0:
                stats = _hs.BlockExecStats.builder()
                meta = _hs.BlockAccessor.for_block(block).get_metadata(
                    exec_stats=stats.build()
                )
                if send_empty_blocks and block.schema is not None and len(block.schema) > 0:
                    shard = _hs._create_empty_table(block.schema)
                    waits = []
                    for pid in range(pool.num_partitions):
                        agg = pool.get_aggregator_for_partition(pid)
                        waits.append(
                            agg.submit.remote(input_index, pid, ray.put(shard))
                        )
                    ray.get(waits)
                return (meta, {})
            return orig_fn(
                block,
                input_index,
                key_columns,
                pool,
                block_transformer=None,
                # every non-empty block broadcasts schema shards to the
                # partitions it misses — the first block of a sequence
                # can be empty (and 0-column), so the driver-side
                # "broadcast once" bookkeeping cannot be trusted.
                send_empty_blocks=True,
                override_partition_id=override_partition_id,
            )

        _hs._shuffle_block = ray.remote(_shuffle_block_schema_safe)
        _APPLIED = True
        return True
    except Exception as e:  # pragma: no cover - version drift guard
        logger.warning("fogray ray hash-shuffle patch not applied: %s", e)
        return False
