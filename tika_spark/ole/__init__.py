from tika_spark.ole.cfb import CfbError, CfbFile
from tika_spark.ole.parser import extract_ole, refine_ole2

__all__ = ["CfbFile", "CfbError", "extract_ole", "refine_ole2"]
