"""Regenerate tika_spark/charset_cp420.py's tables from the JDK.

The IBM420 byte<->char tables are public IBM CDRA code page 420 spec
data; rather than transcribe them by hand we dump them
deterministically from the JDK 17 charset implementation through the
Spark JVM gateway (the same JVM the engine already runs on).

    python tools/gen_cp420_tables.py   # prints the two table bodies

The checked-in tika_spark/charset_cp420.py embeds this output; rerun
and diff to audit.
"""
from __future__ import annotations


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[1]")
             .config("spark.ui.enabled", "false").getOrCreate())
    jvm = spark._jvm
    cs = jvm.java.nio.charset.Charset.forName("IBM420")

    # decode table: bytes 0x00..0xFF in one shot
    s = jvm.java.lang.String(bytes(range(256)), "IBM420")
    assert isinstance(s, str) and len(s) == 256
    print("DECODE_TABLE = (")
    for i in range(0, 256, 8):
        print('    "' + "".join("\\u%04x" % ord(c)
                                for c in s[i:i + 8]) + '"')
    print(")")

    # encode map: per-char over the relevant Unicode blocks; the
    # Charset.encode convenience substitutes 0x3F for unmappable
    # input, so a hit on the substitution byte is verified by decode
    def enc1(c):
        bb = cs.encode(c)
        return (bb.get() & 0xFF) if bb.remaining() == 1 else None

    sub = enc1("一")
    pairs = []
    for lo, hi in [(0x00, 0x100), (0x0600, 0x0700), (0x0750, 0x0780),
                   (0x200B, 0x2010), (0xFB50, 0xFE00),
                   (0xFE70, 0xFF00)]:
        for cp in range(lo, hi):
            b = enc1(chr(cp))
            if b is None:
                continue
            if b == sub and ord(s[sub]) != cp:
                continue          # substitution, not a real mapping
            pairs.append((cp, b))
    print("ENCODE_MAP = {")
    for i in range(0, len(pairs), 6):
        print("    " + " ".join(f"0x{cp:04x}: 0x{b:02x},"
                                for cp, b in pairs[i:i + 6]))
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
