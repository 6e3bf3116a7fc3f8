"""pdf_extractor_ray — a Ray-Data-native web-scale extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
glindberg2000/PDF-extractor (reference at /root/reference, see SURVEY.md),
re-expressed as streaming ``ray.data.Dataset`` pipelines over Arrow batches:

- flagship: main-content extraction over Common-Crawl-style ``pages`` tables
  ``(url, warc_ts, html, text, lang)`` — HTML boilerplate stripping via
  text-density/link-density block classification (stateless ``map_batches``)
  and PDF-style layout reconstruction via XY-cut (actor-pool ``map_batches``),
- the reference's full operator inventory (filters, projections, normalizers,
  grouped aggregates, joins-as-broadcast-lookups, dedup, sort/top-k, explode),
- large-scale training-data ops: exact/MinHash/SimHash dedup, ANN similarity,
  language ID, quality scoring, token counting, fingerprinting,
- per-partition lineage + checkpoint/resume manifests.

No module in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the driver, ``bench.py`` and the test fixture only.
"""

__version__ = "0.1.0"
