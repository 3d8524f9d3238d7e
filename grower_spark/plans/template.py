"""nginx ``log_format`` string -> Java-compatible regex, compiled at plan time.

Reference behavior (/root/reference/pkg/nginx/template.go:43-57): each
``$var`` placeholder followed by a delimiter character ``d`` becomes the
capture ``(?P<var>[^d]*)`` and the literal text between placeholders is
matched verbatim; the pattern is anchored at the start only, so trailing
line content beyond the format is ignored (template.go:22-37 takes only the
submatch groups).  A trailing ``$var`` at end-of-format captures ``[^ ]*``
(the reference appends a space before quoting and trims it afterwards).
Directly concatenated vars ``$a$b`` share the next literal's delimiter, which
makes ``$a`` greedy and ``$b`` empty — an inherent ambiguity of the format we
reproduce rather than "fix".

This implementation is a fresh tokenizer (literal/var token stream), not a
translation of the reference's quote-then-rewrite trick; the output grammar is
the RE2-safe subset (escaped literals + ``[^d]*`` classes) so Go and Java
regex semantics coincide (SURVEY.md §7 risk 1).

Java group names may not contain underscores, so groups are positional and
``var_names`` carries the mapping.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_VAR_RE = re.compile(r"\$([A-Za-z0-9_]+)")

# Characters that are regex metacharacters in Java (superset-safe escaping).
_JAVA_META = set("\\.[]{}()*+-?^$|&#~ \t\n\r\f\v")

# Field separator used by the single-pass extract (regexp_replace + split).
# \x01 never occurs in well-formed access logs; lines containing it are
# routed to the dead-letter output (documented divergence).
GROUP_SEP = "\x01"


def _escape_literal(text: str) -> str:
    return "".join("\\" + ch if ch in _JAVA_META else ch for ch in text)


def _escape_class_char(ch: str) -> str:
    if ch in "\\^]-[":
        return "\\" + ch
    return ch


@dataclass
class LogFormat:
    """Compiled nginx log format: anchored Java regex + ordered var names."""

    format: str
    pattern: str
    var_names: list[str]

    @staticmethod
    def compile(fmt: str) -> "LogFormat":
        tokens: list[tuple[str, str]] = []  # ("lit", text) | ("var", name)
        pos = 0
        for m in _VAR_RE.finditer(fmt):
            if m.start() > pos:
                tokens.append(("lit", fmt[pos : m.start()]))
            tokens.append(("var", m.group(1)))
            pos = m.end()
        if pos < len(fmt):
            tokens.append(("lit", fmt[pos:]))

        out = ["^"]
        names: list[str] = []
        for i, (kind, val) in enumerate(tokens):
            if kind == "lit":
                out.append(_escape_literal(val))
                continue
            names.append(val)
            # Delimiter = first char of the next non-empty literal; a var at
            # end-of-format (or before another var) delimits on space, like
            # the reference's append-space-then-trim (template.go:52-56).
            delim = " "
            for kind2, val2 in tokens[i + 1 :]:
                if kind2 == "lit" and val2:
                    delim = val2[0]
                    break
                if kind2 == "var":
                    break
            out.append("([^" + _escape_class_char(delim) + "]*)")
        return LogFormat(format=fmt, pattern="".join(out), var_names=names)

    @property
    def n_groups(self) -> int:
        return len(self.var_names)

    def group_index(self, var: str) -> int:
        """1-based regex group index for a variable name."""
        return self.var_names.index(var) + 1

    def replacement(self, sep: str = GROUP_SEP) -> str:
        """regexp_replace replacement joining all groups with ``sep``.

        Used by the single-regex-pass extraction: the pattern (suffixed with
        ``.*$`` so the whole line is the match region) is rewritten to
        ``$1<sep>$2<sep>...`` and then split — one regex execution per line
        instead of one per column.
        """
        return sep.join(f"${i + 1}" for i in range(len(self.var_names)))

    def full_line_pattern(self) -> str:
        """Pattern extended to consume the whole line (for regexp_replace)."""
        return self.pattern + ".*$"
