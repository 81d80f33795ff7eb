"""HTML extraction chain — the core web path.

From-scratch reimplementation of the reference's HTML pipeline
(tika-parsers/.../html/*): charset cascade -> lenient DOM -> safe-element
mapping -> head/body handling -> XHTML layout serialization -> optional
boilerplate block classification. One DOM, many pure projections (text,
links, metadata) computed in a single walk — the tee-handler analog.
"""

from tika_spark.html.extract import extract_html  # noqa: F401
