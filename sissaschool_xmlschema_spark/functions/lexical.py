"""Lexical spaces of the XSD builtin types, as XSD-dialect anchored regexes.

The reference binds a lexical validator (or a ``fromstring`` parser that
rejects bad lexicals) to every builtin type (``xmlschema/validators/
builtins.py:72-183`` for the common set, ``:365-500`` for the year-related
and XSD 1.1 derived types — duration, the gregorian g* fragments,
dateTimeStamp, dayTime/yearMonthDuration).  This module is the engine's
twin: one anchored pattern per builtin, written in the XSD regex dialect
and lowered to a JVM ``rlike`` through :mod:`.xsd_regex` — so the check is
pure Column work, no Python in the hot path.

Value-space notes (documented deltas from the reference's parsers):

* ``date``/``dateTime``/``dateTimeStamp`` enforce per-month day caps
  lexically (31/30/29) but accept Feb-29 in any year — full leap-year
  validation is a *value-space* concern handled by the decode sink's
  ``try_cast`` failure channel (plans/decode.py), exactly where the
  reference puts it (``fromstring`` → datetime construction).
* ``gMonthDay`` accepts ``--02-29`` unconditionally (it IS valid: the type
  denotes a recurring day, and Feb 29 recurs).
* numeric lexicals cover the XSD 1.1 forms (``+INF`` admitted for
  float/double, builtins.py:398-414).
"""

from __future__ import annotations

from typing import Optional

from sissaschool_xmlschema_spark.functions.xsd_regex import translate_and_anchor

# --- shared fragments (XSD regex dialect: no (?:, no lookaround) -----------

_TZ = r"(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))?"
_TZ_REQUIRED = r"(Z|(\+|-)((0[0-9]|1[0-3]):[0-5][0-9]|14:00))"
# [-][Y*]YYYY with no leading zero on 5+ digit years (builtins.py:454-462)
_YEAR = r"-?([1-9][0-9]{3,}|0[0-9]{3})"
# month-day with per-month day caps (Feb capped at 29, leap-agnostic)
_MONTH_DAY = (
    r"((0[13578]|1[02])-(0[1-9]|[12][0-9]|3[01])"
    r"|(0[469]|11)-(0[1-9]|[12][0-9]|30)"
    r"|02-(0[1-9]|[12][0-9]))"
)
_TIME_BODY = (
    r"(([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9](\.[0-9]+)?"
    r"|24:00:00(\.0+)?)"
)
# duration time part: T followed by at least one of H/M/S (hour branch may
# carry optional M and S, minute branch optional S)
_DUR_TIME = (
    r"T([0-9]+H([0-9]+M)?([0-9]+(\.[0-9]+)?S)?"
    r"|[0-9]+M([0-9]+(\.[0-9]+)?S)?"
    r"|[0-9]+(\.[0-9]+)?S)"
)
# duration date part: at least one of Y/M/D
_DUR_DATE = r"([0-9]+Y([0-9]+M)?([0-9]+D)?|[0-9]+M([0-9]+D)?|[0-9]+D)"

_NCNAME = r"[\i-[:]][\c-[:]]*"

# --- the registry -----------------------------------------------------------

# builtin local name → XSD-dialect pattern for its whole lexical space;
# None = the type imposes no lexical constraint the engine checks via regex
# (anyURI: the reference only collapses whitespace, no RFC 2396 validation).
XSD_LEXICAL: dict[str, Optional[str]] = {
    # durations (builtins.py:130-136, :479-491)
    "duration": rf"-?P({_DUR_DATE}({_DUR_TIME})?|{_DUR_TIME})",
    "yearMonthDuration": r"-?P([0-9]+Y([0-9]+M)?|[0-9]+M)",
    "dayTimeDuration": rf"-?P([0-9]+D({_DUR_TIME})?|{_DUR_TIME})",
    # gregorian calendar fragments (builtins.py:96-126, :399-416, :452-469)
    "gYear": _YEAR + _TZ,
    "gYearMonth": _YEAR + r"-(0[1-9]|1[0-2])" + _TZ,
    "gMonth": r"--(0[1-9]|1[0-2])" + _TZ,
    "gMonthDay": r"--" + _MONTH_DAY + _TZ,
    "gDay": r"---(0[1-9]|[12][0-9]|3[01])" + _TZ,
    # dates and times (builtins.py:417-445, dateTimeStamp :472-478)
    "date": _YEAR + "-" + _MONTH_DAY + _TZ,
    "time": _TIME_BODY + _TZ,
    "dateTime": _YEAR + "-" + _MONTH_DAY + "T" + _TIME_BODY + _TZ,
    "dateTimeStamp": _YEAR + "-" + _MONTH_DAY + "T" + _TIME_BODY + _TZ_REQUIRED,
    # names and tokens (builtins.py:186-238)
    "Name": r"\i\c*",
    "NCName": _NCNAME,
    "ID": _NCNAME,
    "IDREF": _NCNAME,
    "ENTITY": _NCNAME,
    "NMTOKEN": r"\c+",
    "language": r"[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*",
    "QName": rf"({_NCNAME}:)?{_NCNAME}",
    "NOTATION": rf"({_NCNAME}:)?{_NCNAME}",
    "anyURI": None,
    # numeric lexical spaces (builtins.py:72-95, :395-414)
    "integer": r"(\+|-)?[0-9]+",
    "nonNegativeInteger": r"(\+)?[0-9]+|-0+",
    "positiveInteger": r"(\+)?0*[1-9][0-9]*",
    "decimal": r"(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)",
    "float": r"(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?"
             r"|(\+|-)?INF|NaN",
    "double": r"(\+|-)?([0-9]+(\.[0-9]*)?|\.[0-9]+)([Ee](\+|-)?[0-9]+)?"
              r"|(\+|-)?INF|NaN",
}

# integer-width builtins share the integer lexical space; their RANGE is a
# value-space facet the XSD compiler emits as Min/MaxInclusive over a cast
# (xsd_compile.builtin_value_facets) — builtins.py:216-330 width table.
for _t in ("long", "int", "short", "byte", "unsignedLong", "unsignedInt",
           "unsignedShort", "unsignedByte", "negativeInteger",
           "nonPositiveInteger"):
    XSD_LEXICAL.setdefault(_t, XSD_LEXICAL["integer"])

INTEGER_RANGES: dict[str, tuple[Optional[int], Optional[int]]] = {
    "long": (-(2**63), 2**63 - 1),
    "int": (-(2**31), 2**31 - 1),
    "short": (-(2**15), 2**15 - 1),
    "byte": (-(2**7), 2**7 - 1),
    "unsignedLong": (0, 2**64 - 1),
    "unsignedInt": (0, 2**32 - 1),
    "unsignedShort": (0, 2**16 - 1),
    "unsignedByte": (0, 2**8 - 1),
    "nonNegativeInteger": (0, None),
    "positiveInteger": (1, None),
    "negativeInteger": (None, -1),
    "nonPositiveInteger": (None, 0),
}


def lexical_java_regex(type_name: str) -> Optional[str]:
    """Anchored Java regex for a builtin's lexical space (None = no check).

    Raises ``KeyError`` for names not in the registry so misspelled types
    fail at spec-compile time on the driver.
    """
    pattern = XSD_LEXICAL[type_name]
    if pattern is None:
        return None
    return translate_and_anchor(pattern)
