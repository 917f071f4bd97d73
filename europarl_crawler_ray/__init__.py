"""europarl_crawler_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch rebuild of the capabilities of ``bockstaller/europarl-crawler``
(reference at /root/reference, studied for semantics only) expressed as
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages (URL-seen Bloom shards, per-host politeness),
and explicit partitioning for the wide steps.

Layout
------
- ``schema``     pyarrow schemas for pages / frontier / fetch_log
- ``functions``  stateless vectorized kernels (url rules, html→text
                 extraction, canonicalization, text analysis, dedup sketches)
- ``sources``    synthetic page generator + mock HTTP resolver + parquet io
- ``state``      stateful actors: seen-set shards, politeness coordinator
- ``stages``     map_batches stage callables (fetcher pool, extractor)
- ``pipelines``  wave driver, postprocess pipeline, query library

No module in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
