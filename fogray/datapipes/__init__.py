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
  window aggregates and gap-based sessionization over the events table;
- :mod:`fogray.datapipes.relational` — grouped top-k and deterministic
  md5-prefix hash sampling.

Everything is expressed as ``map_batches`` over Arrow/NumPy batches plus
hash ``groupby``/``join`` shuffles; no per-row Python in hot paths.
"""
