"""Safe-element mapping — boilerplate-strip level 0.

From-scratch port of the *rules* of the reference's DefaultHtmlMapper
(tika-parsers/.../html/DefaultHtmlMapper.java:33-137): a whitelist of
structural elements kept in the normalized event stream, a per-element
attribute whitelist, and a discard set (``script``/``style`` subtrees
vanish entirely — text included). Unknown elements are dropped but
their text is kept.
"""

from __future__ import annotations

# source tag (lowercase) -> normalized XHTML tag
SAFE_ELEMENTS: dict[str, str] = {
    "h1": "h1", "h2": "h2", "h3": "h3", "h4": "h4", "h5": "h5", "h6": "h6",
    "p": "p", "pre": "pre", "blockquote": "blockquote", "q": "q",
    "ul": "ul", "ol": "ol", "menu": "ul", "li": "li",
    "dl": "dl", "dt": "dt", "dd": "dd",
    "table": "table", "thead": "thead", "tbody": "tbody",
    "tr": "tr", "th": "th", "td": "td",
    "address": "address",
    "a": "a",                                    # TIKA-460
    "map": "map", "area": "area", "img": "img",  # TIKA-463 URL carriers
    "frameset": "frameset", "frame": "frame", "iframe": "iframe",
    "object": "object", "param": "param", "ins": "ins", "del": "del",
}

DISCARD_ELEMENTS = frozenset({"script", "style"})

SAFE_ATTRIBUTES: dict[str, frozenset] = {
    "a": frozenset({"charset", "type", "name", "href", "hreflang", "rel",
                    "rev", "shape", "coords"}),
    "img": frozenset({"src", "alt", "longdesc", "height", "width",
                      "usemap", "ismap"}),
    "frame": frozenset({"longdesc", "name", "src", "frameborder",
                        "marginwidth", "marginheight", "noresize",
                        "scrolling"}),
    "iframe": frozenset({"longdesc", "name", "src", "frameborder",
                         "marginwidth", "marginheight", "scrolling",
                         "align", "height", "width"}),
    "link": frozenset({"charset", "href", "hreflang", "type", "rel",
                       "rev", "media"}),
    "map": frozenset({"id", "class", "style", "title", "name"}),
    "area": frozenset({"shape", "coords", "href", "nohref", "alt"}),
    "object": frozenset({"declare", "classid", "codebase", "data", "type",
                         "codetype", "archive", "standby", "height",
                         "width", "usemap", "name", "tabindex", "align",
                         "border", "hspace", "vspace"}),
    "param": frozenset({"id", "name", "value", "valuetype", "type"}),
    "blockquote": frozenset({"cite"}),
    "ins": frozenset({"cite", "datetime"}),
    "del": frozenset({"cite", "datetime"}),
    "q": frozenset({"cite"}),
}

# attributes whose values are URLs to be resolved against the base
# (HtmlHandler.java:166-215)
URL_ATTRIBUTES = frozenset({"src", "href", "longdesc", "cite"})


def map_safe_element(tag: str) -> str | None:
    return SAFE_ELEMENTS.get(tag)


def safe_attrs(mapped_tag: str, attrs: dict) -> dict:
    allowed = SAFE_ATTRIBUTES.get(mapped_tag)
    if not allowed:
        return {}
    return {k: v for k, v in attrs.items() if k in allowed}
