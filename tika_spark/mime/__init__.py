"""MIME detection — the engine's predicate/dispatch layer.

Reimplements (from scratch, in Python) the semantics of the reference's
detection stack: magic-byte rules, XML root-element refinement,
text-vs-binary sniffing, filename globs, and supertype-lattice evidence
combination (reference: tika-core .../detect/*, .../mime/*).
"""

from tika_spark.mime.detector import detect, detect_batch  # noqa: F401
from tika_spark.mime.lattice import is_specialization_of, supertype  # noqa: F401
