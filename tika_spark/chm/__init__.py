from tika_spark.chm.itsf import ChmError, ChmFile
from tika_spark.chm.lzx import LzxDecoder, LzxError
from tika_spark.chm.parser import extract_chm

__all__ = ["ChmFile", "ChmError", "LzxDecoder", "LzxError", "extract_chm"]
