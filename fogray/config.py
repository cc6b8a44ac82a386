"""Engine configuration knobs (the rebuild's analog of FOG's CLI
``-p/-d/-m`` + segment_config, headers/config.hpp:92-268)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class EngineConfig:
    #: number of edge partitions == number of pinned-CSR actors. Default
    #: (None) = min(32, cluster CPUs). FOG analog: ``-p`` processors with
    #: vid-mod-P striping (config.hpp:60-62); here partitions are block
    #: ranges of the (src-sorted) edge table.
    num_partitions: int | None = None

    #: CPUs RESERVED per edge-partition actor (Ray resource accounting).
    #: Default 0: the actors' vectorized scatter kernels are short bursts
    #: and a nonzero reservation held by long-lived actors starves the
    #: tree-reduce tasks (and any concurrent engine) of schedulable CPUs
    #: — with P == num_cpus reserved, the gather tasks deadlock. On a
    #: dedicated multi-node cluster where one engine owns the nodes,
    #: set this to ~1.0 to pin one actor per core.
    num_cpus_per_actor: float = 0.0

    #: vertex-count ceiling for dense (bincount / full-array) combine of
    #: sum-type programs; above it the engine switches to sparse
    #: (ids, vals) partials so no O(V) array is shipped per partition.
    dense_threshold: int = 8_000_000

    #: if the active frontier covers more than this fraction of vertices,
    #: scatter uses a full boolean mask over the partition's edges;
    #: below it, CSR range expansion touches only active vertices' edges
    #: (the rebuild's answer to FOG's bitmap-walk scatter,
    #: cpu_thread.cpp:168-171).
    frontier_mask_cutoff: float = 0.05

    #: enable the resident pipelined superstep loop for GLOBAL
    #: fixed-iteration dense sum programs (PageRank/Katz): state lives
    #: sliced in the range-owner actors and supersteps chain through
    #: object refs, removing the O(V) driver-serial fold/put per
    #: superstep (the Amdahl term that capped multi-worker scaling).
    #: Automatically bypassed when a ckpt_dir is given (per-superstep
    #: checkpoints need driver-visible state each superstep).
    resident: bool = True

    #: checkpoint every k supersteps (0 disables). north_rule asks for
    #: per-superstep checkpoints => default 1 when a ckpt_dir is given.
    ckpt_interval: int = 1

    #: number of vid-range shards per checkpoint (per-partition lineage).
    ckpt_shards: int = 8
