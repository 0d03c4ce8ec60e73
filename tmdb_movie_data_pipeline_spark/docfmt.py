"""Docstring constant substitution.

Many operator docstrings quote their module's tuning constants ("top
{_LM_TOPN} bigrams", "{_MK_ITERS} iterations") so the prose tracks the
code. Written as plain strings those braces render literally (ADVICE r7 +
r8 flagged this twice); written as f-strings they stop being docstrings at
all (an f-string is not a string literal, so the compiler does not attach
it to ``__doc__``). The uniform fix: modules call
``format_docstrings(globals())`` once at import, and every function's
``{CONSTANT}`` placeholder that names a module-level constant is replaced
with its value.

Substitution is deliberately narrow — only ``{ALL_CAPS_NAME}`` tokens that
resolve to an int/float/str in the module namespace are touched, via
targeted ``str.replace`` (never ``str.format``, which would raise on any
brace the module does not define, e.g. literal set notation in prose).
"""

from __future__ import annotations

import re
from typing import Any

_PLACEHOLDER = re.compile(r"\{(_?[A-Z][A-Z_0-9]*)\}")


def format_docstrings(namespace: dict[str, Any]) -> None:
    """Substitute ``{CONST}`` placeholders in the docstrings of every
    function DEFINED in the calling module (imports are left alone) with
    the module's own constants. Idempotent: a docstring with no
    resolvable placeholders is untouched."""
    module = namespace.get("__name__")
    for obj in list(namespace.values()):
        doc = getattr(obj, "__doc__", None)
        if (
            not callable(obj)
            or not isinstance(doc, str)
            or getattr(obj, "__module__", None) != module
        ):
            continue
        names = set(_PLACEHOLDER.findall(doc))
        for name in names:
            value = namespace.get(name)
            if isinstance(value, (int, float, str)) and not isinstance(
                value, bool
            ):
                doc = doc.replace("{%s}" % name, str(value))
        if doc is not obj.__doc__:
            try:
                obj.__doc__ = doc
            except (AttributeError, TypeError):
                pass  # builtins / slotted callables: leave as-is
