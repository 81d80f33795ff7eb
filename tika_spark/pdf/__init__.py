"""PDF extraction chain (D1-D3).

From-scratch pure-Python PDF text extraction (no PDF library exists in
the runtime): object scanner, FlateDecode streams, a content-stream
text interpreter with reading order = content-stream order (the
reference's choice: PDF2XHTML.java:84-98 sets sortByPosition=false),
and doc-info metadata extraction (PDFParser.java:102-138).
"""

from tika_spark.pdf.parser import extract_pdf  # noqa: F401
