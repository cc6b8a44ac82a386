"""fogray — a from-scratch Ray-Data-native link-graph analytics engine.

Re-expresses the capabilities of the FOG out-of-core scatter-gather graph
engine (reference: /root/reference, C++ X-Stream/GraphChi family) as
idiomatic Ray Data pipelines:

- the ``convert`` front-end (SNAP text -> binary CSR, external sorts;
  ``convert/*.cpp``) becomes a Parquet -> edge-table derive stage built on
  ``ray.data.Dataset`` transforms (:mod:`fogray.derive`);
- the scatter/gather engine (``fogsrc/fog_engine.cpp``) becomes a
  superstep runtime over edge partitions pinned in stateful Ray actors
  with vectorized numpy kernels (:mod:`fogray.engine`);
- the six vertex programs (``application/*.hpp``) become
  :class:`~fogray.programs.VertexProgram` instances with FOG-exact
  semantics (:mod:`fogray.programs`), verified against pure-numpy oracles
  (:mod:`fogray.oracle`);
- plus the large-scale training-data operators a 100 TB pipeline needs
  (:mod:`fogray.datapipes`): dedup, ANN, text analysis, multimodal
  plumbing.

No function in this package calls ``ray.init()`` / ``ray.shutdown()``;
session ownership belongs to the caller (driver, bench.py, tests).
"""

__version__ = "0.1.0"

# Apply the Ray 2.49 hash-shuffle schema-broadcast fix (see the module
# docstring of fogray._ray_patches) as soon as the package is imported,
# before any Dataset plan is built.
from . import _ray_patches as _rp

_rp.apply()
