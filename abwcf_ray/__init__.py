"""abwcf_ray — a Ray-Data-native rebuild of ABWCF (Actor-Based Web Crawling Framework).

A brand-new crawl/data-processing engine expressing the reference's semantics
(amin-aoulkadi/ABWCF, Scala/Pekko) as `ray.data.Dataset` pipelines: zero-copy
Arrow `map_batches` stages, actor pools for the sharded URL-seen set, and
`groupby(host)` shuffles for the per-host politeness scheduler.

Subpackages
-----------
- ``functions``  — pure, vectorizable kernels (URL normalization, robots.txt
  parsing/matching, HTML link+text extraction, 64-bit hashing).
- ``sources``    — corpus fixture generation and parquet readers (the
  "simulated web" the fetch stage joins against).
- ``stages``     — Ray Data batch transforms (normalize, scope filter, robots
  filters, prioritize, fetch-sim, scheduler top-k, dedup, text analysis,
  similarity search, multimodal plumbing).
- ``state``      — cross-wave mutable state: sharded seen-set actors, hosts
  (robots rules) table maintenance.
- ``pipelines``  — the wave driver (crawl loop, checkpoints, resume, metrics)
  and the single-process oracle used by golden tests.
"""

from abwcf_ray.config import CrawlConfig, NormalizationConfig

__all__ = ["CrawlConfig", "NormalizationConfig"]
__version__ = "0.1.0"
