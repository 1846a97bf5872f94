"""kmcp_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of shenwei356/kmcp
(sketch → index → search → merge → profile over genome k-mer sketches;
see /root/reference) as an idiomatic Ray Data pipeline over tables of
image + caption pairs:

- caption k-shingling + scaled MinHash  <- kmcp ``compute`` k-mer /
  FracMinHash sketching (reference: kmcp/cmd/compute.go:746-824)
- LSH band-hash groupby shuffle         <- the COBS-style bit-sliced
  index blocks (reference: kmcp/cmd/index.go, util-db-search.go)
- candidate scoring by containment / Jaccard <- kmcp ``search`` qCov /
  tCov / jacc (reference: kmcp/cmd/util-db-search.go:7466-7493)
- suffix-automaton substring containment <- kmcp exact k-mer
  containment queries
- union-find connected components        <- the profile stage's grouping
  of matches into per-target assignments (reference: kmcp/cmd/profile.go)

No code is copied from the reference; all algorithms are re-implemented
from public knowledge on top of ray.data.Dataset / pyarrow / numpy.
"""

from kmcp_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
