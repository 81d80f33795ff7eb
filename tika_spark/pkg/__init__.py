"""Package/container formats: archives (zip/gzip/tar/bzip2), OOXML,
ODF, EPUB — SURVEY.md §2 E6, E8-E10, B8, F1."""

from tika_spark.pkg.container import refine_container
from tika_spark.pkg.parser import extract_package

__all__ = ["extract_package", "refine_container"]
