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

from tika_spark.mime.globs_extra import EXTRA_EXT_MAP, EXTRA_NAME_MAP

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

    # ---- bulk breadth toward the reference's 952-glob table
    # (tika-mimetypes.xml; names follow the registered IANA /
    # freedesktop types the reference uses). Source/text formats ride
    # the text/* lattice edge into the TXT parser; +xml into the XML
    # parser; +zip into the package parser; the rest surface as typed
    # status rows instead of octet-stream.

    # source code / markup / config (text tier)
    "c": "text/x-csrc", "h": "text/x-chdr",
    "cpp": "text/x-c++src", "cxx": "text/x-c++src",
    "cc": "text/x-c++src", "hpp": "text/x-c++hdr",
    "hh": "text/x-c++hdr", "hxx": "text/x-c++hdr",
    "java": "text/x-java-source", "py": "text/x-python",
    "rb": "text/x-ruby", "pl": "text/x-perl", "pm": "text/x-perl",
    "php": "text/x-php", "sh": "application/x-sh",
    "bash": "application/x-sh", "zsh": "application/x-sh",
    "bat": "application/bat", "cmd": "application/bat",
    "ps1": "application/x-powershell",
    "go": "text/x-go", "rs": "text/x-rustsrc",
    "swift": "text/x-swift", "kt": "text/x-kotlin",
    "scala": "text/x-scala", "lua": "text/x-lua",
    "tcl": "text/x-tcl", "sql": "text/x-sql",
    "r": "text/x-rsrc", "jl": "text/x-julia",
    "m": "text/x-objcsrc", "mm": "text/x-objcsrc",
    "cs": "text/x-csharp", "vb": "text/x-vbasic",
    "d": "text/x-d", "dart": "text/x-dart",
    "groovy": "text/x-groovy", "erl": "text/x-erlang",
    "hs": "text/x-haskell", "ml": "text/x-ocaml",
    "lisp": "text/x-common-lisp", "clj": "text/x-clojure",
    "f": "text/x-fortran", "f77": "text/x-fortran",
    "f90": "text/x-fortran", "for": "text/x-fortran",
    "pas": "text/x-pascal", "asm": "text/x-asm", "s": "text/x-asm",
    "yaml": "application/x-yaml", "yml": "application/x-yaml",
    "toml": "application/toml",
    "ini": "text/x-ini", "cfg": "text/x-ini", "conf": "text/x-ini",
    "properties": "text/x-java-properties",
    "md": "text/x-web-markdown", "markdown": "text/x-web-markdown",
    "rst": "text/x-rst", "adoc": "text/x-asciidoc",
    "tex": "application/x-tex", "latex": "application/x-latex",
    "bib": "application/x-bibtex-text-file",
    "diff": "text/x-diff", "patch": "text/x-diff",
    "po": "text/x-gettext-translation",
    "coffee": "text/x-coffeescript",
    "less": "text/x-less", "scss": "text/x-scss", "sass": "text/x-sass",
    "vcf": "text/x-vcard", "vcard": "text/x-vcard",
    "ics": "text/calendar", "vcs": "text/x-vcalendar",
    "srt": "application/x-subrip", "vtt": "text/vtt",
    "ass": "text/x-ssa", "ssa": "text/x-ssa",
    "m3u": "audio/x-mpegurl", "m3u8": "application/vnd.apple.mpegurl",
    "pls": "audio/x-scpls", "cue": "application/x-cue",
    "sgml": "text/sgml", "sgm": "text/sgml",
    "wml": "text/vnd.wap.wml",
    "vm": "text/x-vm", "jsp": "text/x-jsp", "asp": "text/asp",
    "aspx": "text/aspdotnet", "cgi": "text/x-cgi",
    "ksh": "application/x-sh", "csh": "application/x-csh",
    "awk": "text/x-awk", "sed": "text/x-sed",
    "el": "text/x-emacs-lisp", "vhd": "text/x-vhdl",
    "v": "text/x-verilog", "proto": "text/x-protobuf",
    "graphql": "text/x-graphql", "cmake": "text/x-cmake",
    "gradle": "text/x-groovy", "sbt": "text/x-scala",
    "dockerfile": "text/x-dockerfile-config",
    "env": "text/x-ini", "lock": "text/plain",
    "nfo": "text/x-nfo", "srx": "application/sparql-results+xml",

    # structured data / web payloads
    "jsonld": "application/ld+json", "ndjson": "application/x-ndjson",
    "jsonl": "application/x-ndjson",
    "geojson": "application/geo+json",
    "gpx": "application/gpx+xml",
    "kml": "application/vnd.google-earth.kml+xml",
    "kmz": "application/vnd.google-earth.kmz",
    "rdf": "application/rdf+xml", "owl": "application/rdf+xml",
    "ttl": "text/turtle", "nt": "application/n-triples",
    "wsdl": "application/wsdl+xml", "xsd": "application/xml",
    "dtd": "application/xml-dtd",
    "xslt": "application/xslt+xml",
    "plist": "application/x-plist",
    "mathml": "application/mathml+xml", "mml": "application/mathml+xml",
    "smil": "application/smil+xml", "smi": "application/smil+xml",
    "xul": "application/vnd.mozilla.xul+xml",
    "xaml": "application/xaml+xml",
    "opml": "text/x-opml+xml",
    "sitemap": "application/xml",
    "avro": "application/avro", "orc": "application/x-orc",
    "arrow": "application/vnd.apache.arrow.file",
    "feather": "application/vnd.apache.arrow.file",
    "pcap": "application/vnd.tcpdump.pcap",
    "pcapng": "application/x-pcapng",
    "har": "application/json",
    "torrent": "application/x-bittorrent",
    "nzb": "application/x-nzb+xml",
    "mat": "application/x-matlab-data",
    "sav": "application/x-spss-sav", "dta": "application/x-stata-dta",
    "dbf": "application/x-dbf",
    "fits": "application/fits", "fts": "application/fits",
    "grb": "application/x-grib", "grib": "application/x-grib",
    "grib2": "application/x-grib",
    "las": "application/vnd.las", "laz": "application/vnd.laszip",
    "shp": "application/x-esri-shapefile",
    "mdb": "application/x-msaccess", "accdb": "application/x-msaccess",
    "db": "application/x-sqlite3",

    # images
    "jp2": "image/jp2", "j2k": "image/x-jp2-codestream",
    "jpf": "image/jpx", "jpx": "image/jpx", "jpm": "image/jpm",
    "jxl": "image/jxl", "heif": "image/heif",
    "svgz": "image/svg+xml",
    "xbm": "image/x-xbitmap", "xpm": "image/x-xpixmap",
    "pbm": "image/x-portable-bitmap", "pgm": "image/x-portable-graymap",
    "ppm": "image/x-portable-pixmap", "pnm": "image/x-portable-anymap",
    "tga": "image/x-tga", "pcx": "image/vnd.zbrush.pcx",
    "ras": "image/x-cmu-raster", "rgb": "image/x-rgb",
    "wmf": "image/wmf", "emf": "image/emf",
    "eps": "application/postscript", "ps": "application/postscript",
    "ai": "application/postscript",
    "cgm": "image/cgm",
    "dcm": "application/dicom", "dicom": "application/dicom",
    "djvu": "image/vnd.djvu", "djv": "image/vnd.djvu",
    "cr2": "image/x-canon-cr2", "crw": "image/x-canon-crw",
    "nef": "image/x-nikon-nef", "dng": "image/x-adobe-dng",
    "arw": "image/x-sony-arw", "orf": "image/x-olympus-orf",
    "rw2": "image/x-panasonic-rw2", "raf": "image/x-fuji-raf",
    "pef": "image/x-pentax-pef", "x3f": "image/x-sigma-x3f",
    "ithmb": "image/x-apple-ithmb",

    # audio
    "aac": "audio/x-aac", "adts": "audio/x-aac",
    "mp2": "audio/mpeg", "mpga": "audio/mpeg",
    "au": "audio/basic", "snd": "audio/basic",
    "aif": "audio/x-aiff", "aiff": "audio/x-aiff",
    "aifc": "audio/x-aiff",
    "ra": "audio/vnd.rn-realaudio", "ram": "audio/vnd.rn-realaudio",
    "wma": "audio/x-ms-wma", "opus": "audio/opus",
    "amr": "audio/amr", "awb": "audio/amr-wb",
    "ac3": "audio/ac3", "eac3": "audio/eac3",
    "dts": "audio/vnd.dts", "caf": "audio/x-caf",
    "gsm": "audio/x-gsm",
    "mod": "audio/x-mod", "s3m": "audio/s3m", "xm": "audio/xm",
    "it": "audio/x-it",
    "ape": "audio/x-ape", "mpc": "audio/x-musepack",
    "tta": "audio/x-tta", "wv": "audio/x-wavpack",

    # video
    "mpeg": "video/mpeg", "mpg": "video/mpeg", "mpe": "video/mpeg",
    "m1v": "video/mpeg", "m2v": "video/mpeg", "vob": "video/mpeg",
    "m4v": "video/x-m4v", "f4v": "video/x-f4v",
    "wmv": "video/x-ms-wmv", "asf": "video/x-ms-asf",
    "rm": "application/vnd.rn-realmedia",
    "rmvb": "application/vnd.rn-realmedia-vbr",
    "ts": "video/mp2t", "mts": "video/mp2t", "m2ts": "video/mp2t",
    "mxf": "application/mxf", "dv": "video/x-dv",
    "swf": "application/x-shockwave-flash",
    "3g2": "video/3gpp2", "h264": "video/h264", "h265": "video/h265",
    "yuv": "video/x-raw-yuv",

    # archives / compression / packages
    "rar": "application/x-rar-compressed",
    "lz": "application/x-lzip", "lzma": "application/x-lzma",
    "lz4": "application/x-lz4", "br": "application/x-brotli",
    "cab": "application/vnd.ms-cab-compressed",
    "arj": "application/x-arj",
    "lha": "application/x-lha", "lzh": "application/x-lha",
    "z": "application/x-compress",
    "cpio": "application/x-cpio", "a": "application/x-archive",
    "ar": "application/x-archive",
    "deb": "application/x-debian-package",
    "rpm": "application/x-rpm",
    "dmg": "application/x-apple-diskimage",
    "iso": "application/x-iso9660-image",
    "crx": "application/x-chrome-package",
    "apk": "application/vnd.android.package-archive",
    "xpi": "application/x-xpinstall",
    "war": "application/x-tika-java-web-archive",
    "ear": "application/x-tika-java-enterprise-archive",
    "aar": "application/java-archive",
    "whl": "application/zip", "nupkg": "application/zip",
    "gem": "application/x-tar",
    "sit": "application/x-stuffit", "sitx": "application/x-stuffitx",
    "ace": "application/x-ace-compressed",
    "alz": "application/x-alz-compressed",
    "tbz2": "application/x-bzip2", "tbz": "application/x-bzip2",
    "txz": "application/x-xz", "tlz": "application/x-lzma",
    "warc": "application/warc",

    # fonts
    "otf": "font/otf", "ttc": "font/collection",
    "eot": "application/vnd.ms-fontobject",
    "pfb": "application/x-font-type1",
    "pfa": "application/x-font-type1",
    "afm": "application/x-font-adobe-metric",
    "bdf": "application/x-font-bdf", "pcf": "application/x-font-pcf",

    # office / productivity (legacy + niche)
    "wpd": "application/vnd.wordperfect",
    "wps": "application/vnd.ms-works",
    "pub": "application/x-mspublisher",
    "vsd": "application/vnd.visio", "vss": "application/vnd.visio",
    "vst": "application/vnd.visio", "vsw": "application/vnd.visio",
    "vsdx": "application/vnd.ms-visio.drawing",
    "mpp": "application/vnd.ms-project",
    "mpt": "application/vnd.ms-project",
    "one": "application/onenote",
    "xlsb": "application/vnd.ms-excel.sheet.binary.macroenabled.12",
    "pages": "application/vnd.apple.pages",
    "numbers": "application/vnd.apple.numbers",
    "key": "application/vnd.apple.keynote",
    "hwp": "application/x-hwp-v5",
    "fodt": "application/vnd.oasis.opendocument.flat.text",
    "fods": "application/vnd.oasis.opendocument.flat.spreadsheet",
    "fodp": "application/vnd.oasis.opendocument.flat.presentation",
    "fodg": "application/vnd.oasis.opendocument.flat.graphics",
    "sxw": "application/vnd.sun.xml.writer",
    "sxc": "application/vnd.sun.xml.calc",
    "sxi": "application/vnd.sun.xml.impress",
    "sxd": "application/vnd.sun.xml.draw",
    "stw": "application/vnd.sun.xml.writer.template",
    "oth": "application/vnd.oasis.opendocument.text-web",
    "odb": "application/vnd.oasis.opendocument.database",
    "dif": "application/x-dif", "slk": "text/spreadsheet",
    "gnumeric": "application/x-gnumeric",
    "abw": "application/x-abiword",
    "602": "application/x-t602",
    "xps": "application/vnd.ms-xpsdocument",
    "oxps": "application/oxps",
    "dot": "application/msword",
    "xlt": "application/vnd.ms-excel",
    "xla": "application/vnd.ms-excel",
    "pps": "application/vnd.ms-powerpoint",
    "pot": "application/vnd.ms-powerpoint",

    # ebooks
    "mobi": "application/x-mobipocket-ebook",
    "prc": "application/x-mobipocket-ebook",
    "azw": "application/x-mobipocket-ebook",
    "azw3": "application/x-mobi8-ebook",
    "fb2": "application/x-fictionbook+xml",
    "lit": "application/x-ms-reader",
    "cbz": "application/x-cbz", "cbr": "application/x-cbr",
    "lrf": "application/x-sony-bbeb",
    "tcr": "application/x-tcr-ebook",
    "pdb": "application/x-palm-database",

    # certificates / crypto
    "pem": "application/x-pem-file",
    "der": "application/x-x509-cert;format=der",
    "crt": "application/x-x509-cert", "cer": "application/x-x509-cert",
    "p12": "application/x-pkcs12", "pfx": "application/x-pkcs12",
    "p7b": "application/x-pkcs7-certificates",
    "p7s": "application/pkcs7-signature",
    "csr": "application/pkcs10",
    "asc": "application/pgp", "pgp": "application/pgp-encrypted",
    "gpg": "application/pgp-encrypted",
    "sig": "application/pgp-signature",

    # executables / bytecode / system
    "ipa": "application/x-itunes-ipa",
    "dex": "application/x-dex",
    "o": "application/x-object", "ko": "application/x-elf",
    "elf": "application/x-elf",
    "dylib": "application/x-mach-o",
    "sys": "application/x-msdownload",
    "cpl": "application/x-msdownload",
    "scr": "application/x-msdownload",
    "ocx": "application/x-msdownload",
    "drv": "application/x-msdownload",
    "com": "application/x-msdownload",
    "lnk": "application/x-ms-shortcut",
    "url": "application/x-mswinurl",
    "reg": "text/x-ms-regedit",
    "hlp": "application/winhlp",
    "ani": "application/x-navi-animation",
    "cur": "image/x-win-bitmap",
    "icns": "image/icns",
    "mo": "application/x-gettext-translation",
    "pyc": "application/x-bytecode.python",
    "rlib": "application/x-archive",
    "jmod": "application/zip",
    "luac": "application/x-lua-bytecode",
}

# long-tail registry supplement; curated entries above take precedence
EXT_MAP = {**EXTRA_EXT_MAP, **EXT_MAP}
NAME_MAP = {**EXTRA_NAME_MAP, **NAME_MAP}


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
