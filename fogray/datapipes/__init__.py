"""Large-scale training-data operators (beyond the reference's graph
engine — the data-pipeline side a 100 TB corpus needs):

- :mod:`fogray.datapipes.text` — token stats / quality scoring,
  language-ID (character n-gram heuristic), document fingerprinting
  (md5 + Karp-Rabin rolling-hash winnowing);
- :mod:`fogray.datapipes.dedup` — exact (hash groupby), near-dup by
  word/shingle Jaccard (blocked self-join), MinHash+LSH (bands ->
  bucket groupby -> verify), SimHash, embedding-cosine near-dup;
- :mod:`fogray.datapipes.similarity` — brute-force cosine top-k
  (broadcast query matrix, per-block partial top-k) and an IVF
  (coarse-quantizer) variant as the scale path;
- :mod:`fogray.datapipes.multimodal` — binary-payload columns with
  typed metadata and an actor-pool decode/featurize stage (decode is a
  deterministic stub per the environment's no-codec constraint; the Ray
  plumbing — schema, actor signature, batching — is real and tested);
- :mod:`fogray.datapipes.streams` — tumbling and sliding (hopping)
  window aggregates, gap-based sessionization, per-user sequence
  features (index / gaps / money-exact running sums / rolling means),
  conversion funnels, event-type transition bigrams, and cohort
  retention over the events table;
- :mod:`fogray.datapipes.relational` — grouped top-k, deterministic
  md5-prefix hash sampling and train/val/test splits, sort-exchange
  joins (as-of, range, anti/semi, dimension, star rollup), exact and
  grouped quantiles, NTILE binning, grouped z-scores, snapshot diffs,
  pivoted counts, and ROLLUP reporting aggregates;
- :mod:`fogray.datapipes.packing` — training-batch assembly: seeded
  global shuffle, token-budget sequence packing, benchmark
  decontamination;
- :mod:`fogray.datapipes.sketches` — mergeable HLL / grouped-HLL /
  count-min sketches;
- :mod:`fogray.datapipes.sink` — resumable hash-partitioned parquet
  output with per-partition done markers.

Everything is expressed as ``map_batches`` over Arrow/NumPy batches plus
hash ``groupby``/``join`` shuffles; no per-row Python in hot paths.
"""
