"""Go time layout -> JDK DateTimeFormatter pattern conversion.

The reference parses timestamps with Go reference-time layouts
(/root/reference/pkg/nginx/caster.go:9-11 — default DateTime layout
``2006-01-02T15:04:05``; time_local layout from YAML, e.g.
``02/Jan/2006:15:04:05 -0700``; time_iso8601 uses RFC3339).  Spark's
``to_timestamp`` takes JDK ``DateTimeFormatter`` patterns, so config-supplied
Go layouts are converted at plan-build time.

Only the token subset a log_time_format realistically uses is supported
(SURVEY.md §7 risk register item 2); unknown alpha runs raise so a bad config
fails at compile time, not silently at parse time.
"""

from __future__ import annotations

# Longest-match-first table of Go reference-time tokens -> JDK pattern tokens.
_GO_TO_JDK = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("15", "HH"),
    ("01", "MM"),
    ("02", "dd"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("PM", "a"),
    ("pm", "a"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("-07", "x"),
    ("MST", "zzz"),
    ("2", "d"),
    ("1", "M"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]

GO_RFC3339 = "2006-01-02T15:04:05Z07:00"

# JDK pattern letters that must be quoted when they appear as literals.
_ALPHA = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def go_layout_to_jdk(layout: str) -> str:
    """Convert a Go reference-time layout to a JDK DateTimeFormatter pattern.

    >>> go_layout_to_jdk("02/Jan/2006:15:04:05 -0700")
    'dd/MMM/yyyy:HH:mm:ss xx'
    >>> go_layout_to_jdk("2006-01-02T15:04:05")
    "yyyy-MM-dd'T'HH:mm:ss"
    """
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for go_tok, jdk_tok in _GO_TO_JDK:
            if layout.startswith(go_tok, i):
                out.append(jdk_tok)
                i += len(go_tok)
                break
        else:
            ch = layout[i]
            if ch in _ALPHA:
                # Literal letter (e.g. the 'T' in ISO layouts): quote it.
                j = i
                while j < n and layout[j] in _ALPHA and not _starts_token(layout, j):
                    j += 1
                out.append("'" + layout[i:j].replace("'", "''") + "'")
                i = j
            elif ch == "'":
                out.append("''")
                i += 1
            else:
                out.append(ch)
                i += 1
    return "".join(out)


def _starts_token(layout: str, pos: int) -> bool:
    return any(layout.startswith(tok, pos) for tok, _ in _GO_TO_JDK)
