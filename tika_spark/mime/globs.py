"""Filename/URL glob detection.

Semantics re-derived from the reference (tika-core/.../mime/
Patterns.java:77-198, detect/NameDetector.java:100-140): URL paths are
stripped of query/fragment and directories and percent-decoded; lookup
precedence is exact literal name, then longest ``*.ext`` suffix
(case-sensitive, then lowercased). The regex-glob tier of the reference
is not needed for the web slice (no ``Makefile``-style rules routed).
"""

from __future__ import annotations

from urllib.parse import unquote

# literal-name tier (freedesktop precedence tier 1)
NAME_MAP: dict[str, str] = {
    "makefile": "text/x-makefile",
    "winmail.dat": "application/vnd.ms-tnef",
}

# suffix tier: extension (lowercase, no dot) -> media type
EXT_MAP: dict[str, str] = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "xml": "application/xml", "xsl": "application/xml",
    "pdf": "application/pdf",
    "txt": "text/plain", "text": "text/plain", "log": "text/plain",
    "csv": "text/csv", "tsv": "text/tab-separated-values",
    "json": "application/json", "js": "application/javascript",
    "css": "text/css",
    "rss": "application/rss+xml", "atom": "application/atom+xml",
    "rtf": "application/rtf",
    "gz": "application/x-gzip", "tgz": "application/x-gzip",
    "zip": "application/zip", "jar": "application/java-archive",
    "tar": "application/x-tar", "bz2": "application/x-bzip2",
    "png": "image/png", "gif": "image/gif",
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "bmp": "image/bmp",
    "svg": "image/svg+xml", "ico": "image/x-icon",
    "tif": "image/tiff", "tiff": "image/tiff",
    "ttf": "application/x-font-ttf", "flv": "video/x-flv",
    "psd": "image/vnd.adobe.photoshop",
    "class": "application/java-vm",
    "doc": "application/msword", "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "msg": "application/vnd.ms-outlook",
    "chm": "application/vnd.ms-htmlhelp",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "odg": "application/vnd.oasis.opendocument.graphics",
    "odc": "application/vnd.oasis.opendocument.chart",
    "odf": "application/vnd.oasis.opendocument.formula",
    "odi": "application/vnd.oasis.opendocument.image",
    "odm": "application/vnd.oasis.opendocument.text-master",
    "ott": "application/vnd.oasis.opendocument.text-template",
    "ots": "application/vnd.oasis.opendocument.spreadsheet-template",
    "otp": "application/vnd.oasis.opendocument.presentation-template",
    "otg": "application/vnd.oasis.opendocument.graphics-template",
    "dotx": "application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.template",
    "docm": "application/vnd.ms-word.document.macroenabled.12",
    "dotm": "application/vnd.ms-word.template.macroenabled.12",
    "xltx": "application/vnd.openxmlformats-officedocument"
            ".spreadsheetml.template",
    "xlsm": "application/vnd.ms-excel.sheet.macroenabled.12",
    "xltm": "application/vnd.ms-excel.template.macroenabled.12",
    "xlam": "application/vnd.ms-excel.addin.macroenabled.12",
    "ppsx": "application/vnd.openxmlformats-officedocument"
            ".presentationml.slideshow",
    "potx": "application/vnd.openxmlformats-officedocument"
            ".presentationml.template",
    "pptm": "application/vnd.ms-powerpoint.presentation.macroenabled.12",
    "ppsm": "application/vnd.ms-powerpoint.slideshow.macroenabled.12",
    "potm": "application/vnd.ms-powerpoint.template.macroenabled.12",
    "ppam": "application/vnd.ms-powerpoint.addin.macroenabled.12",
    "epub": "application/epub+zip",
    "mp3": "audio/mpeg", "mp4": "video/mp4", "wav": "audio/x-wav",
    "eml": "message/rfc822", "mbox": "application/mbox",
    "class": "application/java-vm",
    # widened web-crawl set (VERDICT r1 task 5)
    "mp4v": "video/mp4", "mpg4": "video/mp4",
    "m4a": "audio/mp4", "m4b": "audio/mp4",
    "3gp": "video/3gpp", "mov": "video/quicktime", "qt": "video/quicktime",
    "webm": "video/webm", "mkv": "video/x-matroska",
    "mka": "video/x-matroska",
    "ogg": "audio/ogg", "oga": "audio/ogg", "spx": "audio/ogg",
    "ogv": "video/ogg", "ogx": "application/ogg",
    "webp": "image/webp", "avif": "image/avif", "heic": "image/heic",
    "avi": "video/x-msvideo", "flac": "audio/x-flac",
    "mid": "audio/midi", "midi": "audio/midi", "kar": "audio/midi",
    "rmi": "audio/midi",
    "woff": "font/woff", "woff2": "font/woff2",
    "sqlite": "application/x-sqlite3", "sqlite3": "application/x-sqlite3",
    "wasm": "application/wasm",
    "7z": "application/x-7z-compressed", "xz": "application/x-xz",
    "zst": "application/zstd",
    "exe": "application/x-msdownload", "dll": "application/x-msdownload",
    "msi": "application/x-msdownload",
    "so": "application/x-elf",
    "parquet": "application/x-parquet",
    "dwg": "image/vnd.dwg", "nc": "application/x-netcdf",
    "cdf": "application/x-netcdf",
    "hdf": "application/x-hdf", "h5": "application/x-hdf",
    "hdf5": "application/x-hdf",
}


def resource_name_from_url(url: str | None) -> str | None:
    """Strip query/fragment/dirs, percent-decode (NameDetector.java:100-140)."""
    if not url:
        return None
    name = url
    for sep in ("?", "#"):
        i = name.find(sep)
        if i >= 0:
            name = name[:i]
    name = name.rstrip("/")
    i = max(name.rfind("/"), name.rfind("\\"))
    if i >= 0:
        name = name[i + 1:]
    name = unquote(name).strip()
    return name or None


def match_name(url_or_name: str | None) -> str | None:
    """Media type from the resource name, or None."""
    name = resource_name_from_url(url_or_name)
    if not name:
        return None
    hit = NAME_MAP.get(name) or NAME_MAP.get(name.lower())
    if hit:
        return hit
    i = name.rfind(".")
    if i < 0 or i == len(name) - 1:
        return None
    ext = name[i + 1:]
    return EXT_MAP.get(ext) or EXT_MAP.get(ext.lower())
